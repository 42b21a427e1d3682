"""Compilation configuration.

Mirrors the reference's ~60-field Configuration
(frontends/concrete-python/concrete/fhe/compilation/configuration.py:954) with
the fields meaningful to the TPU build; unknown kwargs are rejected, and
`fork(**overrides)` has the reference's override semantics (:1213).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class ParameterSelectionStrategy(enum.Enum):
    V0 = "v0"
    MONO = "mono"
    MULTI = "multi"      # planned: per-partition keysets


@dataclasses.dataclass
class Configuration:
    verbose: bool = False
    show_graph: bool = False
    show_statistics: bool = False
    p_error: Optional[float] = None            # per-PBS error bound
    global_p_error: Optional[float] = None     # circuit-wide error bound
    security_level: int = 128
    parameter_selection_strategy: ParameterSelectionStrategy = \
        ParameterSelectionStrategy.MONO
    enable_unsafe_features: bool = False
    use_insecure_key_cache: bool = False
    insecure_key_cache_location: Optional[str] = None
    show_progress: bool = False
    compress_evaluation_keys: bool = False
    compress_input_ciphertexts: bool = False
    # TPU-specific
    device_batch_size: Optional[int] = None    # PBS batch tile; None = auto
    mesh_shape: Optional[tuple] = None         # multi-chip sharding mesh
    # forced crypto parameters (bypass the optimizer; e.g. for benches)
    forced_parameters: Optional[object] = None
    # forced WoP-PBS gadgets (cbs_level, cbs_base_log, pfks_level,
    # pfks_base_log) — bypass choose_wop_gadgets (tests/benches)
    forced_wop_parameters: Optional[tuple] = None

    def __post_init__(self):
        if self.p_error is None and self.global_p_error is None:
            self.p_error = 6.3e-5   # reference default target (v0 tables)
        # accept strategy as a string, like the reference Configuration
        if isinstance(self.parameter_selection_strategy, str):
            self.parameter_selection_strategy = \
                ParameterSelectionStrategy(self.parameter_selection_strategy)

    def fork(self, **overrides) -> "Configuration":
        known = {f.name for f in dataclasses.fields(self)}
        unknown = set(overrides) - known
        if unknown:
            raise TypeError(f"unexpected configuration option(s): {unknown}")
        return dataclasses.replace(self, **overrides)
