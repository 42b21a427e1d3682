"""Deployment: server archive + client keys, like the reference deploy guide."""
import tempfile

import concrete_tpu as fhe


@fhe.compiler({"x": "encrypted"})
def inc(x):
    return x + 1


if __name__ == "__main__":
    circuit = inc.compile(range(8))
    path = tempfile.mktemp(suffix=".zip")
    circuit.server.save(path)

    server = fhe.Server.load(path)          # "server side"
    circuit.keygen()                        # "client side"
    enc = circuit.encrypt(4)
    out = server.run(enc, evaluation_keys=circuit.keys.evaluation)
    print("inc(4) =", circuit.decrypt(out[0]))
