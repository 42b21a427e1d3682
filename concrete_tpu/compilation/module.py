"""Multi-function modules with composition.

Reference: frontends/concrete-python/concrete/fhe/compilation/module.py
(FheModule/FheFunction, ExecutionRt) and module_compiler.py (ModuleCompiler
with @fhe.function methods).  All functions of a module share one keyset and
one (mono) encoding, so any function's encrypted output can feed any
function's encrypted input without decryption (the reference's composition
rules; we implement the AllComposable policy).
"""

from __future__ import annotations

from typing import Callable, Optional


from concrete_tpu.compilation.client import Client
from concrete_tpu.compilation.configuration import Configuration
from concrete_tpu.compilation.keys import Keys
from concrete_tpu.compilation.server import Server
from concrete_tpu.compilation.specs import ClientSpecs
from concrete_tpu.compilation.transforms import run_default_transforms
from concrete_tpu.optimizer import optimize_v0
from concrete_tpu.tracing import Tracer


class FunctionDef:
    """One function of a module (reference module_compiler.py:34)."""

    def __init__(self, function: Callable, statuses: dict[str, str]):
        self.function = function
        self.statuses = statuses
        self.graph = None

    def trace_and_measure(self, inputset):
        inputset = list(inputset)
        graph = Tracer.trace(self.function, self.statuses,
                             sample=inputset[0],
                             name=self.function.__name__)
        run_default_transforms(graph)
        graph.measure_bounds(inputset)
        graph.update_dtypes_from_bounds()
        self.graph = graph
        return graph


def function(statuses: dict[str, str]):
    """Marks a module method as an FHE function (reference @fhe.function)."""

    def decorator(fn):
        fn._fhe_function = FunctionDef(fn, statuses)
        return fn

    return decorator


class FheFunction:
    """A compiled module function: run/encrypt/decrypt via the shared keys."""

    def __init__(self, name: str, graph, specs: ClientSpecs, client: Client):
        self.name = name
        self.graph = graph
        self.client_specs = specs
        self.client = client
        self.server = Server(graph, specs)

    def encrypt(self, *args):
        return self.client.encrypt(*args)

    def run(self, *args):
        self.client.keygen()
        if not hasattr(self, "_norm2"):
            self._norm2 = self.graph.max_norm2()
        outs = self.server.run(
            *args, evaluation_keys=self.client.keys.evaluation_for(
                self.client_specs.message_bits, norm2=self._norm2))
        return outs if len(outs) != 1 else outs[0]

    def decrypt(self, *results):
        return self.client.decrypt(*results)

    def encrypt_run_decrypt(self, *args):
        enc = self.encrypt(*args)
        if len(self.client_specs.inputs) == 1:
            enc = (enc,)
        res = self.run(*enc)
        if len(self.client_specs.outputs) == 1:
            return self.decrypt(res)
        return self.decrypt(*res)

    def simulate(self, *args):
        """Noise-accurate plaintext simulation of this function."""
        from concrete_tpu.simulation import simulate_graph
        return simulate_graph(self.graph, self.client_specs, *args)

    def run_async(self, *args):
        """Run on the dataflow scheduler; args may be Futures of other
        functions' run_async results (module composition as a task graph
        — the RT/DFR analog)."""
        from concrete_tpu.compilation.scheduler import default_scheduler
        return default_scheduler().submit(self.run, *args)

    @property
    def _statistic_records(self):
        from concrete_tpu.compilation import statistics as st
        if not hasattr(self, "_stats_cache"):
            self._stats_cache = st.collect(
                self.graph, self.server._executor,
                self.client_specs.message_bits)
        return self._stats_cache

    @property
    def statistics(self) -> dict:
        """Primitive-op counts for this function (reference module
        function feedback; same grid as Circuit.statistics)."""
        from concrete_tpu.compilation import statistics as st
        recs = self._statistic_records
        out = {}
        for kind in st.KINDS:
            out[f"{kind}_count"] = st.total(recs, kind)
            out[f"{kind}_count_per_parameter"] = st.per_parameter(recs, kind)
            out[f"{kind}_count_per_tag"] = st.per_tag(recs, kind)
        return out

    @property
    def programmable_bootstrap_count(self) -> int:
        from concrete_tpu.compilation import statistics as st
        return st.total(self._statistic_records, st.PBS)


class FheModule:
    """A set of compiled functions sharing one keyset (composable)."""

    def __init__(self, functions: dict[str, FheFunction], keys: Keys):
        self._functions = functions
        self.keys = keys

    def __getattr__(self, name):
        fns = object.__getattribute__(self, "_functions")
        if name in fns:
            return fns[name]
        raise AttributeError(name)

    @property
    def function_names(self):
        return list(self._functions)

    def keygen(self, force: bool = False, seed: Optional[int] = None):
        if force or not self.keys.are_generated:
            self.keys.generate(seed)


class ModuleCompiler:
    def __init__(self, cls):
        self.cls = cls
        self.functions: dict[str, FunctionDef] = {}
        for attr in dir(cls):
            fn = getattr(cls, attr)
            fdef = getattr(fn, "_fhe_function", None)
            if fdef is not None:
                self.functions[attr] = fdef

    def compile(self, inputsets: dict[str, list],
                configuration: Optional[Configuration] = None,
                **kwargs) -> FheModule:
        config = configuration or Configuration()
        if kwargs:
            config = config.fork(**kwargs)
        graphs = {}
        p = 1
        norm2 = 1
        for name, fdef in self.functions.items():
            if name not in inputsets:
                raise ValueError(f"no inputset for module function '{name}'")
            g = fdef.trace_and_measure(inputsets[name])
            graphs[name] = g
            p = max(p, g.max_bit_width)
            norm2 = max(norm2, g.max_norm2())
        # the composition policy (reference composition.py; class attribute
        # `composition`, default AllComposable) decides which functions need
        # the shared module-wide encoding: composable functions pin every
        # value to the module width, the rest keep per-value widths
        from concrete_tpu.compilation.composition import (AllComposable,
                                                          CompositionPolicy)
        from concrete_tpu.compilation.widths import assign_encoding_widths
        policy = getattr(self.cls, "composition", None)
        if policy is None:
            policy = AllComposable()
        if not isinstance(policy, CompositionPolicy):
            raise TypeError("module `composition` must be a "
                            "CompositionPolicy (AllComposable / "
                            "NotComposable / Wired)")
        unified = policy.unified_functions(graphs)
        for name, g in graphs.items():
            if name in unified:
                for node in g.graph.nodes:
                    if node.output.is_encrypted:
                        node.properties["encoding_width"] = p
            else:
                assign_encoding_widths(g)
        if config.forced_parameters is not None:
            params = config.forced_parameters
        else:
            params = optimize_v0(p, norm2=norm2,
                                 p_error=config.p_error or 6.3e-5,
                                 security_level=config.security_level)
        keys = Keys(params)
        client0 = None
        functions = {}
        for name, g in graphs.items():
            from concrete_tpu.compilation.widths import (
                encoding_width, output_encoding_width)
            specs = ClientSpecs(
                params=params, message_bits=p,
                inputs=[n.output for n in g.ordered_inputs],
                outputs=[n.output for n in g.ordered_outputs],
                # per-position encoding widths: unified functions use the
                # module width, NotComposable/unwired ones their own
                # (without these the client would encode at message_bits
                # while the executor uses per-node widths -> garbage)
                input_widths=[encoding_width(n, p)
                              for n in g.ordered_inputs],
                output_widths=[output_encoding_width(n, p)
                               for n in g.ordered_outputs])
            client = Client(specs, keys)
            client0 = client0 or client
            functions[name] = FheFunction(name, g, specs, client)
        return FheModule(functions, keys)


def module():
    """The @fhe.module() class decorator (reference decorators.py)."""

    def decorator(cls):
        return ModuleCompiler(cls)

    return decorator
