"""Encrypted quantized MLP inference (models.QuantizedMLP)."""
import numpy as np

from concrete_tpu.models import QuantizedMLP

if __name__ == "__main__":
    mlp = QuantizedMLP(d_in=8, d_hidden=4, d_out=2)
    circuit = mlp.compile()
    x = np.random.default_rng(0).integers(0, 4, (8,))
    print("clear:", mlp.infer_clear(x))
    print("fhe:  ", circuit.encrypt_run_decrypt(x))
