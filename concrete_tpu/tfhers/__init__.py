from concrete_tpu.tfhers.dtypes import (TFHERSIntegerType, CryptoParams as
                                        TFHERSCryptoParams, uint8_2_2,
                                        uint16_2_2, int8_2_2)
from concrete_tpu.tfhers.bridge import Bridge, new_bridge
from concrete_tpu.tfhers.ops import to_native, from_native

__all__ = ["TFHERSIntegerType", "TFHERSCryptoParams", "uint8_2_2",
           "uint16_2_2", "int8_2_2", "Bridge", "new_bridge", "to_native",
           "from_native"]
