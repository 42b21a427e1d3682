"""Example encrypted workloads ("models").

TPU-native counterparts of the reference's example/benchmark programs
(frontends/concrete-python/examples/ and benchmarks/{game_of_life,
levenshtein_distance,static_kvdb}.py, plus the Concrete-ML-style quantized
MLP of BASELINE config #5).
"""

from concrete_tpu.models.mlp import QuantizedMLP
from concrete_tpu.models.game_of_life import GameOfLife
from concrete_tpu.models.levenshtein import LevenshteinDistance
from concrete_tpu.models.kvdb import StaticKeyValueDatabase
from concrete_tpu.models.xor_distance import HammingDistance
from concrete_tpu.models.pir import PrivateInformationRetrieval
from concrete_tpu.models.prime_match import PrimeMatch
from concrete_tpu.models.sha1 import Sha1

__all__ = ["QuantizedMLP", "GameOfLife", "LevenshteinDistance",
           "StaticKeyValueDatabase", "HammingDistance",
           "PrivateInformationRetrieval", "PrimeMatch", "Sha1"]
