"""Dataflow scheduler tests (RT-dialect / DFR analog)."""

import time

import numpy as np

import concrete_tpu as fhe
from concrete_tpu.compilation.scheduler import DataflowScheduler
from concrete_tpu.params import TEST_PARAMS_TINY


def test_future_arguments_form_a_chain():
    s = DataflowScheduler(max_workers=2)
    f1 = s.submit(lambda: 3)
    f2 = s.submit(lambda v: v * 2, f1)        # consumes f1's future
    f3 = s.submit(lambda a, b: a + b, f1, f2)
    assert f3.result() == 9
    s.shutdown()


def test_independent_tasks_overlap():
    s = DataflowScheduler(max_workers=4)

    def slow(v):
        time.sleep(0.2)
        return v

    t0 = time.time()
    futures = [s.submit(slow, i) for i in range(4)]
    assert [f.result() for f in futures] == [0, 1, 2, 3]
    elapsed = time.time() - t0
    assert elapsed < 0.6, f"tasks serialized: {elapsed:.2f}s"
    s.shutdown()


def test_run_async_composition_chain():
    """Chained encrypted calls: the second run consumes the first's Future
    (output -> input composition without blocking the submitter).
    composable=True ties input/output encodings so the chain is valid."""
    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY,
                            composable=True)

    @fhe.compiler({"x": "encrypted"})
    def inc(x):
        return (x + 1) % 4

    circuit = inc.compile(range(4), cfg)
    circuit.keygen(seed=3)
    from concrete_tpu.compilation.scheduler import default_scheduler
    for _ in range(4):
        enc = circuit.encrypt(1)
        fut1 = circuit.run_async(enc)
        fut2 = default_scheduler().submit(circuit._run_sync, fut1)
        got = circuit.decrypt(fut2.result())
        if got == 3:
            return
    raise AssertionError(f"composition chain returned {got}, want 3")


def test_auto_schedule_run_returns_future():
    cfg = fhe.Configuration(forced_parameters=TEST_PARAMS_TINY,
                            auto_schedule_run=True)

    @fhe.compiler({"x": "encrypted"})
    def f(x):
        return x + 1

    circuit = f.compile(range(4), cfg)
    circuit.keygen(seed=4)
    enc = circuit.encrypt(2)
    fut = circuit.run(enc)
    import concurrent.futures
    assert isinstance(fut, concurrent.futures.Future)
    assert circuit.decrypt(fut.result()) == 3
