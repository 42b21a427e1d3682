"""Noise-accurate plaintext simulation.

Reference: lib/Runtime/simulation.cpp (sim_* kernels: plaintext op + Gaussian
noise drawn from the noise model) and the SimulateTFHE pass.  Simulation runs
the traced graph on plaintexts while tracking each value's noise variance via
the same formulas the optimizer uses, sampling Gaussian noise at every
decision point (TLU index) to reproduce the real error probability —
no keys, no crypto, so it is fast enough for test sweeps.
"""

from __future__ import annotations

import numpy as np

from concrete_tpu import params as pp
from concrete_tpu.representation import Operation

__all__ = ["simulate_graph"]


def simulate_graph(graph, specs, *inputs, rng=None,
                   detect_overflow: bool = False):
    """Evaluate with simulated noise; returns outputs like the real circuit.

    detect_overflow: warn when an encrypted value exceeds its encoding
    width (the reference's detect_overflow_in_simulation: overflow wraps
    silently in FHE, so simulation is where it is catchable)."""
    import functools
    import warnings

    from concrete_tpu.compilation.widths import encoding_width
    rng = rng or np.random.default_rng()
    p_default = specs.message_bits

    def check_overflow(node, value):
        if not detect_overflow or not node.output.is_encrypted:
            return
        w = encoding_width(node, p_default)
        v = np.asarray(value)
        signed = getattr(node.output.dtype, "is_signed", False)
        lo = -(1 << (w - 1)) if signed else 0
        hi = (1 << (w - 1)) - 1 if signed else (1 << w) - 1
        if v.size and (v.min() < lo or v.max() > hi):
            warnings.warn(
                f"simulation overflow at %{node.uid} [{node.name}]: "
                f"value range [{v.min()}, {v.max()}] exceeds the "
                f"{w}-bit {'signed' if signed else 'unsigned'} encoding "
                f"[{lo}, {hi}] (would wrap silently in FHE)",
                RuntimeWarning, stacklevel=3)

    @functools.lru_cache(maxsize=None)
    def stages(width):
        """(fresh, br, ks, ms, max_native_bits) of `width`'s partition —
        mono circuits resolve every width to the single keyset."""
        params = specs.params_for_width(width) \
            if hasattr(specs, "params_for_width") else specs.params
        # fresh inputs are encrypted under the BIG key at glwe_std
        # (client.py _secret_for)
        fresh = params.glwe_std ** 2
        br = pp.variance_blind_rotate(
            params.n_small, params.glwe_dimension, params.polynomial_size,
            params.pbs_base_log, params.pbs_level, params.glwe_std ** 2)
        ks = pp.variance_keyswitch(
            params.n_big, params.ks_base_log, params.ks_level,
            params.lwe_std ** 2)
        ms = pp.variance_modulus_switch(
            params.n_small, params.log2_polynomial_size)
        return fresh, br, ks, ms, min(
            8, params.polynomial_size.bit_length() - 2)

    def wop_gadgets_for(width):
        multi = getattr(specs, "partition_wop_gadgets", None)
        if multi:
            return multi.get(width)
        return getattr(specs, "wop_gadgets", None)

    def crossing_var(w_in, w_out):
        """Conversion-keyswitch variance a fresh PBS output picks up when
        it crosses the (w_in -> w_out) partition frontier."""
        conv = getattr(specs, "conversions", None)
        if not conv or w_in == w_out or (w_in, w_out) not in conv:
            return 0.0
        lvl, base = conv[(w_in, w_out)]
        src = specs.params_for_width(w_in)
        dst = specs.params_for_width(w_out)
        return pp.variance_keyswitch(src.n_big, base, lvl, dst.glwe_std ** 2)

    values: dict = {}
    variances: dict = {}

    for node in graph.topological_order():
        name = node.name
        preds = graph.ordered_preds_of(node)
        if node.operation == Operation.Input:
            pos = next(q for q, n in graph.input_nodes.items() if n is node)
            values[node] = np.asarray(inputs[pos])
            variances[node] = stages(encoding_width(node, p_default))[0] \
                if node.output.is_encrypted else 0.0
            continue
        if node.operation == Operation.Constant:
            values[node] = node()
            variances[node] = 0.0
            continue
        args = [values[q] for q in preds]
        if name in ("tlu", "univariate"):
            from concrete_tpu.compilation.widths import tlu_fused_lsbs
            x = np.asarray(args[0])
            # sample the decision noise at the TLU boundary, at the input
            # partition's encoding width (multi-precision mono); fused
            # rounding enlarges the decision step by 2^lsbs
            p_in = encoding_width(preds[0], p_default)
            w_out = encoding_width(node, p_default)
            _, br_var, ks_var, ms_var, max_native_bits = stages(p_in)
            lsbs = tlu_fused_lsbs(graph, node)
            step = 2.0 ** -(p_in + 1)   # torus width of one encoded step
            total_var = variances[preds[0]] + ks_var + ms_var
            noise = rng.normal(0.0, np.sqrt(total_var), x.shape)
            quantum = 1 << lsbs
            shifted = x + quantum * np.round(
                noise / (step * quantum)).astype(np.int64)
            domain = 1 << p_in
            shifted = ((shifted % domain) + domain) % domain
            if node.inputs[0].dtype.is_signed:
                half = domain // 2
                shifted = np.where(shifted >= half, shifted - domain, shifted)
            values[node] = np.asarray(node(shifted))
            wop_gadgets = wop_gadgets_for(p_in)
            if max(p_in - lsbs, 1) > max_native_bits \
                    and wop_gadgets is not None:
                # wide TLU: output noise is the vertical-packing variance
                cbs_l, cbs_b, pfks_l, pfks_b = wop_gadgets
                nb = p_in + (1 if node.inputs[0].dtype.is_signed else 0)
                variances[node] = pp.wop_output_variance(
                    specs.params_for_width(p_in)
                    if hasattr(specs, "params_for_width") else specs.params,
                    nb, cbs_b, cbs_l, pfks_b, pfks_l)
            else:
                variances[node] = br_var
            variances[node] += crossing_var(p_in, w_out)
        elif name == "multivariate":
            # packed TLU: decision noise on the packed index at the packed
            # width (executor packed_layout semantics); output variance
            # resets to one blind-rotate like any PBS
            from concrete_tpu.compilation.executor import (
                multivariate_raw_table, packed_layout)
            from concrete_tpu.compilation.widths import packed_width
            preds_enc = [q for q in preds if q.output.is_encrypted]
            p_in = max(encoding_width(q, p_default) for q in preds_enc)
            w_out = encoding_width(node, p_default)
            _, br_var, ks_var, ms_var, _ = stages(p_in)
            mins, widths_, offsets = packed_layout(graph, node)
            packed = 0
            var_in = 0.0
            for q, val, mn, off in zip(preds, args, mins, offsets):
                packed = packed + ((np.asarray(val, dtype=np.int64) - mn)
                                   << off)
                var_in += variances[q] * float(1 << off) ** 2 \
                    if q.output.is_encrypted else 0.0
            table = multivariate_raw_table(graph, node, p_in)
            step = 2.0 ** -(p_in + 1)
            total_var = var_in + ks_var + ms_var
            noise = rng.normal(0.0, np.sqrt(total_var), np.shape(packed))
            shifted = packed + np.round(noise / step).astype(np.int64)
            domain = 1 << p_in
            shifted = ((shifted % domain) + domain) % domain
            values[node] = table[shifted]
            variances[node] = br_var + crossing_var(p_in, w_out)
        elif name == "dynamic_tlu":
            # runtime-table lookup: the same decision-noise model as a
            # static TLU, with the table read from the clear operand
            table = np.asarray(args[0])
            x = np.asarray(args[1])
            p_in = encoding_width(preds[1], p_default)
            w_out = encoding_width(node, p_default)
            _, br_var, ks_var, ms_var, _ = stages(p_in)
            step = 2.0 ** -(p_in + 1)
            total_var = variances[preds[1]] + ks_var + ms_var
            noise = rng.normal(0.0, np.sqrt(total_var), x.shape)
            shifted = x + np.round(noise / step).astype(np.int64)
            domain = 1 << p_in
            shifted = ((shifted % domain) + domain) % domain
            if node.inputs[1].dtype.is_signed:
                half = domain // 2
                shifted = np.where(shifted >= half, shifted - domain,
                                   shifted)
            values[node] = table[shifted]
            variances[node] = br_var + crossing_var(p_in, w_out)
        elif name == "extract_bits":
            # lsb-cascade (executor extract_bits lowering): peel bits LSB
            # first with one sign-PBS decision per bit; a flipped decision
            # corrupts the residual and thus all higher peels, exactly as
            # the real cascade fails
            positions = tuple(node.properties["kwargs"]["positions"])
            x = np.asarray(args[0]).astype(np.int64)
            p_in = encoding_width(preds[0], p_default)
            _, br_var, ks_var, ms_var, _ = stages(p_in)
            domain = np.int64(1) << np.int64(p_in)
            resid = ((x % domain) + domain) % domain
            var_in = variances[preds[0]]
            out = np.zeros_like(resid)
            for j_bit in range(max(positions) + 1):
                # cleaning subtractions add one br noise per previous peel;
                # shifting the bit to the torus MSB scales noise by
                # 2^(p_in - 1 - j_bit); sign decision flips past 1/4 torus
                var_acc = var_in + j_bit * br_var + ks_var + ms_var
                scale = 2.0 ** (p_in - 1 - j_bit)
                noise = rng.normal(0.0, np.sqrt(var_acc), resid.shape) * scale
                bit = (((resid >> np.int64(j_bit)) & 1)
                       ^ (np.abs(noise) > 0.25)).astype(np.int64)
                if j_bit in positions:
                    out |= bit << np.int64(positions.index(j_bit))
                resid = resid - (bit << np.int64(j_bit))
            values[node] = out
            variances[node] = len(positions) * br_var + crossing_var(
                p_in, encoding_width(node, p_default))
        elif name == "trace_message":
            # Tracing dialect analog (lib/Dialect/Tracing): simulation
            # prints the current plaintext, like sim trace_plaintext
            values[node] = args[0]
            variances[node] = variances[preds[0]]
            msg = node.properties["kwargs"].get("message", "trace")
            print(f"[trace] {msg}: {np.asarray(args[0])}")
        else:
            values[node] = np.asarray(node(*args))
            # propagate variance through leveled ops (MANP-style)
            if name in ("add", "subtract"):
                variances[node] = sum(variances[q] for q in preds)
            elif name == "negative":
                variances[node] = variances[preds[0]]
            elif name == "multiply":
                enc = [q for q in preds if q.output.is_encrypted]
                clear = [q for q in preds if not q.output.is_encrypted]
                scale = 1.0
                for c in clear:
                    hi = max(abs(np.asarray(values[c]).min()),
                             abs(np.asarray(values[c]).max()), 1)
                    scale *= float(hi) ** 2
                variances[node] = (variances[enc[0]] if enc else 0.0) * scale
            elif name == "sum":
                # variance scales by the number of elements actually summed
                # along the reduced axes, not the whole tensor
                src = [q for q in preds if q.output.is_encrypted]
                base = variances[src[0]] if src else 0.0
                in_size = max(preds[0].output.size, 1)
                out_size = max(node.output.size, 1)
                variances[node] = base * (in_size // out_size)
            elif name in ("matmul", "dot"):
                # clear-weight contractions amplify by the true squared
                # 2-norm along the contraction axis (MANP semantics,
                # MANP.cpp:55), matching graph.max_norm2's orientation
                src = [q for q in preds if q.output.is_encrypted]
                base = variances[src[0]] if src else 0.0
                clear = [q for q in preds if not q.output.is_encrypted]
                if clear:
                    w = np.asarray(values[clear[0]], dtype=np.float64)
                    if w.ndim <= 1:
                        amp = float((w ** 2).sum())
                    elif preds[0] is clear[0]:   # w @ ct: contract axis -1
                        amp = float((w ** 2).sum(axis=-1).max())
                    else:                        # ct @ w: contract axis 0
                        amp = float((w ** 2).sum(axis=0).max())
                    variances[node] = base * max(amp, 1.0)
                else:
                    k_len = preds[0].output.shape[-1] \
                        if preds[0].output.shape else 1
                    variances[node] = base * max(k_len, 1)
            else:
                variances[node] = max((variances[q] for q in preds),
                                      default=0.0)

        check_overflow(node, values[node])

    outs = tuple(values[n] for n in graph.ordered_outputs)
    return outs[0] if len(outs) == 1 else outs
