"""Table lookups and univariate functions (one PBS each)."""
import concrete_tpu as fhe

table = fhe.LookupTable([2, 1, 3, 0])


@fhe.compiler({"x": "encrypted"})
def f(x):
    return table[x] + fhe.univariate(lambda v: v // 2)(x)


if __name__ == "__main__":
    circuit = f.compile(range(4))
    for v in range(4):
        print(v, "->", circuit.encrypt_run_decrypt(v))
