"""README quickstart: encrypted addition."""
import concrete_tpu as fhe


@fhe.compiler({"x": "encrypted", "y": "encrypted"})
def add(x, y):
    return x + y


if __name__ == "__main__":
    circuit = add.compile([(2, 3), (0, 0), (7, 7)])
    print("params:", circuit.client_specs.params)
    print("add(2, 6) =", circuit.encrypt_run_decrypt(2, 6))
