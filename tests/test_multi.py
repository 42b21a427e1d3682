"""Multi-partition (DAG_MULTI) compilation tests.

Reference analog: concrete-optimizer/src/optimization/dag/multi_parameters/
(partitionning.rs PRECISION cut, keys_spec.rs per-partition keysets +
ConversionKeySwitchKey) and the TFHECircuitSolutionParametrization lowering.
Here partitions are keyed by encoding width (compilation/multi.py).
"""

import numpy as np
import pytest

import concrete_tpu as fhe
from concrete_tpu.compilation.keys import MultiKeys
from concrete_tpu.compilation.multi import plan_partitions
from concrete_tpu.compilation.specs import ClientSpecs


BIG = 4          # big TLU width (N=1024 partition — CPU-test friendly)
TABLE_SMALL = [3, 1, 2, 0]
TABLE_BIG = [(i * 7) % 4 for i in range(1 << BIG)]


def _mixed_circuit(strategy):
    """x (2-bit) and y (BIG-bit) each feed their own TLU; the outputs join."""
    table_small = fhe.LookupTable(TABLE_SMALL)
    table_big = fhe.LookupTable(TABLE_BIG)

    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return table_small[x] + table_big[y]

    inputset = [(int(i % 4), int((i * 13) % (1 << BIG)))
                for i in range(30)]
    return f.compile(inputset, parameter_selection_strategy=strategy)


def test_plan_partitions_mixed_widths():
    table_small = fhe.LookupTable(TABLE_SMALL)
    table_big = fhe.LookupTable(TABLE_BIG)

    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return table_small[x] + table_big[y]

    graph = f.trace([(int(i % 4), int((i * 13) % (1 << BIG)))
                     for i in range(30)])
    from concrete_tpu.compilation.transforms import run_default_transforms
    from concrete_tpu.compilation.widths import assign_encoding_widths
    run_default_transforms(graph)
    assign_encoding_widths(graph)
    plan = plan_partitions(graph)
    assert plan is not None
    # the merge search may relabel the small partition onto the output
    # width's group id (round 5: output-only partitions are cheap to
    # merge into, see multi.plan_partitions) — assert structure, not ids
    assert BIG in plan.params and len(plan.params) >= 2
    small = min(plan.params, key=lambda w: plan.params[w].polynomial_size)
    # the small partition must be cheaper than the big one
    assert (plan.params[small].polynomial_size
            < plan.params[BIG].polynomial_size)
    # crossings into the sum's class get conversion keyswitches
    assert all(src in plan.params and dst in plan.params
               for src, dst in plan.fks)


def test_plan_partitions_single_width_returns_none():
    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.LookupTable(list(range(16)))[x]

    graph = f.trace([int(i % 16) for i in range(20)])
    from concrete_tpu.compilation.transforms import run_default_transforms
    from concrete_tpu.compilation.widths import assign_encoding_widths
    run_default_transforms(graph)
    assign_encoding_widths(graph)
    assert plan_partitions(graph) is None


@pytest.fixture(scope="module")
def multi_circuit():
    return _mixed_circuit("multi")


def test_multi_compiles_to_partitioned_specs(multi_circuit):
    specs = multi_circuit.client_specs
    assert specs.is_multi
    assert BIG in specs.partitions and len(specs.partitions) >= 2
    assert specs.conversions  # at least one frontier


def test_multi_end_to_end(multi_circuit):
    circuit = multi_circuit
    circuit.keygen(seed=7)
    assert isinstance(circuit.keys, MultiKeys)
    hi = (1 << BIG) - 1
    for x, y in [(0, 0), (3, hi), (2, 5), (1, 11)]:
        got = circuit.encrypt_run_decrypt(x, y)
        assert got == TABLE_SMALL[x] + TABLE_BIG[y], (x, y, got)


def test_multi_cheaper_than_mono(multi_circuit):
    mono = _mixed_circuit("mono")
    assert multi_circuit.complexity < mono.complexity


def test_multi_specs_serialization_roundtrip(multi_circuit):
    specs = multi_circuit.client_specs
    restored = ClientSpecs.deserialize(specs.serialize())
    assert restored.is_multi
    assert restored.partitions == specs.partitions
    assert restored.conversions == specs.conversions
    assert restored.partition_norm2 == specs.partition_norm2


def test_multi_keys_serialization_roundtrip(multi_circuit):
    multi_circuit.keygen(seed=7)   # independent of test order (xdist)
    keys = multi_circuit.keys
    blob = keys.serialize()
    restored = MultiKeys.deserialize_with(
        blob, multi_circuit.client_specs.partitions,
        multi_circuit.client_specs.conversions)
    assert restored.are_generated
    for w in multi_circuit.client_specs.partitions:
        np.testing.assert_array_equal(restored.secret_for(w).glwe,
                                      keys.secret_for(w).glwe)


def test_multi_server_save_load(multi_circuit, tmp_path):
    from concrete_tpu.compilation.server import Server
    path = str(tmp_path / "multi.zip")
    multi_circuit.server.save(path)
    server = Server.load(path)
    assert server.client_specs.is_multi
    circuit = multi_circuit
    circuit.keygen(seed=7)
    enc = circuit.encrypt(2, 11)
    out = server.run(*enc, evaluation_keys=circuit._evaluation_keys())
    assert circuit.decrypt(out[0]) == TABLE_SMALL[2] + TABLE_BIG[11]


def test_multi_simulation(multi_circuit):
    for x, y in [(1, 5), (3, (1 << BIG) - 2)]:
        assert multi_circuit.simulate(x, y) \
            == TABLE_SMALL[x] + TABLE_BIG[y]


def test_multi_pbs_widths_stay_per_partition(multi_circuit):
    per_width = multi_circuit.programmable_bootstrap_count_per_bit_width
    assert per_width.get(2) == 1 and per_width.get(BIG) == 1


def test_decision_constraints_stop_at_successor_tlu_outputs():
    """A successor TLU that is also a circuit output re-encodes the noise:
    the upstream TLU's constraint list must contain the successor's INPUT
    width but not a decode constraint at the successor's output width
    (regression: the output loop swept in every walked node)."""
    from concrete_tpu.compilation.transforms import run_default_transforms
    from concrete_tpu.compilation.widths import (assign_encoding_widths,
                                                 decision_constraints_after)

    table_small = fhe.LookupTable(TABLE_SMALL)
    wide_table = fhe.LookupTable(list(range(1 << 10)))

    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return wide_table[table_small[x] * 256 + y]

    graph = f.trace([(int(i % 4), int((i * 77) % 256)) for i in range(40)])
    run_default_transforms(graph)
    graph_default = graph.max_bit_width
    assign_encoding_widths(graph)
    tlu_nodes = [n for n in graph.topological_order() if n.name == "tlu"]
    small = next(n for n in tlu_nodes if n.output.dtype.bit_width <= 2)
    cons = decision_constraints_after(graph, small, graph_default)
    widths = [w for w, _ in cons]
    # the wide TLU's input decode point (10 bits) is a constraint...
    assert 10 in widths
    # ...but its output width must NOT constrain the small TLU's noise
    # (the bootstrap re-encodes); with one successor TLU that is the only
    # entry
    assert len(cons) == 1, cons


def test_extract_bits_crossing_needs_no_wop_gadgets():
    """extract_bits lowers to a sign-PBS cascade, never WoP: a wide
    extract_bits whose output crosses into a narrower partition must not
    force WoP gadget selection (and its PFPKSK) on the source partition."""
    from concrete_tpu.compilation.transforms import run_default_transforms
    from concrete_tpu.compilation.widths import assign_encoding_widths

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return fhe.bits(x)[0] + fhe.bits(x)[1]

    graph = f.trace([int((i * 997) % (1 << 12)) for i in range(50)])
    run_default_transforms(graph)
    assign_encoding_widths(graph)
    plan = plan_partitions(graph)
    if plan is None:
        return  # single partition: equally fine, nothing forced WoP
    assert plan.wop_gadgets == {}, plan.wop_gadgets


# ---------------------------------------------------------------------------
# Joint (mergeable) planning: the cut is kept only when it is modeled
# cheaper than unification (reference multi_parameters/optimize/mod.rs:1009
# compares candidate partitionings by cost) — see plan_partitions
# ---------------------------------------------------------------------------


def _plan_for(f, inputset):
    from concrete_tpu.compilation.transforms import run_default_transforms
    from concrete_tpu.compilation.widths import assign_encoding_widths
    graph = f.trace(inputset)
    run_default_transforms(graph)
    assign_encoding_widths(graph)
    return plan_partitions(graph)


def test_joint_planning_decision_flips_with_small_partition_weight():
    """The greedy merge responds to modeled cost: the output-only
    partition (no PBS of its own) is merged into a TLU partition —
    paying its decode constraint at the TLU partition's parameters costs
    less than a third keyset + conversion keyswitches — while genuinely
    different TLU widths stay split.  (Round 5: with output decodes
    correctly modeled as noise-only, a separate small-width keyset is
    nearly free in runtime MACs, so the historical "mono wins at low
    rep count" flip no longer exists in the 2-bit/7-bit family; the
    decision exercised here is the output-partition merge, which is the
    same cost comparison.)  Reference behavior: optimize/mod.rs keeps a
    cut only when the partitioned solution beats unification."""
    t2 = fhe.LookupTable([3, 1, 2, 0])
    t7 = fhe.LookupTable([(i * 7) % (1 << 7) for i in range(1 << 7)])

    def make(reps):
        @fhe.compiler({"x": "encrypted", "y": "encrypted"})
        def f(x, y):
            a = x
            for _ in range(reps):
                a = t2[a]
            return a + t7[y]
        return f

    inputset = [(int(i % 4), int((i * 13) % (1 << 7)))
                for i in range(30)] + [(3, 127)]
    for reps in (1, 8):
        plan = _plan_for(make(reps), inputset)
        assert plan is not None                       # multi wins
        # finest cut is {2-bit TLUs, 7-bit TLU, 8-bit output}; the
        # output-only partition must have been merged away
        assert len(plan.params) == 2, plan.params
        big = max(plan.params,
                  key=lambda w: plan.params[w].polynomial_size)
        small = min(plan.params,
                    key=lambda w: plan.params[w].polynomial_size)
        assert plan.params[small].polynomial_size \
            < plan.params[big].polynomial_size


def test_joint_planning_merges_partial_groups():
    """Close widths merge while distant ones stay split: partition ids on
    the graph nodes are rewritten to the merged group id, so downstream
    (keysets, executor) sees the merged grouping."""
    from concrete_tpu.compilation.transforms import run_default_transforms
    from concrete_tpu.compilation.widths import (assign_encoding_widths,
                                                 part_width, partition_of)
    t2 = fhe.LookupTable([3, 1, 2, 0])
    t7 = fhe.LookupTable([(i * 7) % 4 for i in range(1 << 7)])

    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        a = x
        for _ in range(8):
            a = t2[a]
        return a + t7[y]

    graph = f.trace([(int(i % 4), int((i * 13) % (1 << 7)))
                     for i in range(30)])
    run_default_transforms(graph)
    assign_encoding_widths(graph)
    plan = plan_partitions(graph)
    assert plan is not None
    # every node's (possibly rewritten) partition id resolves to a solved
    # partition — the merge is persisted on the graph, not just the plan
    default = graph.max_bit_width
    for node in graph.graph.nodes:
        if node.output.is_encrypted:
            assert partition_of(node, default) in plan.params
    # parameters per partition stay monotone in width
    ws = sorted(plan.params, key=part_width)
    polys = [plan.params[w].polynomial_size for w in ws]
    assert polys == sorted(polys)


# ---------------------------------------------------------------------------
# PRECISION_AND_NORM2 cut (reference partition_cut.rs PrecisionAndNorm2):
# same-width encoding classes with different norm2 buckets get their own
# partitions/keysets (widths.assign_norm2_partitions)
# ---------------------------------------------------------------------------

N2_TABLE = [(3 * i) % 16 for i in range(1 << 6)]


def _norm2_circuit(multi_parameter_strategy):
    """Two 6-bit classes: x*15 (norm2 15) feeding one TLU, and y (norm2 1)
    feeding a CHAIN of two TLUs.  PRECISION merges them into one 6-bit
    partition; the norm2 cut splits them — and the chain gives the cheap
    class enough weight that the joint planner keeps the split (with a
    single TLU per class, unification is modeled cheaper and wins)."""
    table = fhe.LookupTable(N2_TABLE)

    @fhe.compiler({"x": "encrypted", "y": "encrypted"})
    def f(x, y):
        return table[x * 15] + table[table[y]]

    inputset = [(int(i % 4), int((i * 31) % 64)) for i in range(40)]
    return f.compile(
        inputset,
        parameter_selection_strategy=fhe.ParameterSelectionStrategy.MULTI,
        multi_parameter_strategy=multi_parameter_strategy)


def _clear_norm2(x, y):
    t = np.asarray(N2_TABLE)
    return int(t[x * 15] + t[t[y]])


@pytest.fixture(scope="module")
def norm2_circuit():
    return _norm2_circuit(fhe.MultiParameterStrategy.PRECISION_AND_NORM2)


def test_norm2_cut_splits_same_width_classes(norm2_circuit):
    from concrete_tpu.compilation.widths import part_width

    circ_p = _norm2_circuit(fhe.MultiParameterStrategy.PRECISION)
    circ_n = norm2_circuit

    six_p = [w for w in (circ_p.client_specs.partitions or {})
             if part_width(w) == 6]
    six_n = [w for w in (circ_n.client_specs.partitions or {})
             if part_width(w) == 6]
    # PRECISION merges the two 6-bit classes; the norm2 cut splits them
    assert len(six_p) <= 1
    assert len(six_n) == 2, circ_n.client_specs.partitions
    # the split's point: the norm2-1 class gets params no costlier than
    # the norm2-15 class's (strictly cheaper in MACs on this circuit)
    from concrete_tpu.optimizer.v0 import cost_pbs_macs

    def pbs_cost(p):
        return cost_pbs_macs(p.n_small, p.glwe_dimension,
                             p.polynomial_size, p.pbs_level, p.pbs_base_log)
    hi = circ_n.client_specs.partitions[min(six_n)]   # rank 0 = high norm2
    lo = circ_n.client_specs.partitions[max(six_n)]
    assert pbs_cost(lo) <= pbs_cost(hi)


@pytest.mark.slow
def test_norm2_cut_end_to_end(norm2_circuit):
    circ = norm2_circuit
    circ.keygen(seed=7)
    for x, y in [(0, 0), (3, 63), (2, 31)]:
        enc = circ.encrypt(x, y)
        out = circ.decrypt(circ.run(*enc))
        assert out == _clear_norm2(x, y), (x, y, out)


def test_norm2_cut_simulation_and_serialization(tmp_path, norm2_circuit):
    circ = norm2_circuit
    assert circ.simulate(3, 40) == _clear_norm2(3, 40)
    # specs round-trip keeps the synthetic partition ids + per-position ids
    specs2 = ClientSpecs.deserialize(circ.client_specs.serialize())
    assert specs2.partitions.keys() == circ.client_specs.partitions.keys()
    assert specs2.input_partitions == circ.client_specs.input_partitions
    # server archive round-trip: partition properties survive graph_io
    from concrete_tpu.compilation.server import Server
    path = tmp_path / "srv.zip"
    circ.server.save(str(path))
    srv = Server.load(str(path))
    ex = srv._executor
    assert set(ex.partitions) == set(circ.client_specs.partitions)
