from concrete_tpu.parallel.sharding import (make_mesh, shard_ciphertexts,
                                            replicate_keys, sharded_pbs_fn)

__all__ = ["make_mesh", "shard_ciphertexts", "replicate_keys",
           "sharded_pbs_fn"]
