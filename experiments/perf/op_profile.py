"""xprof op-profile of the production K-chain GGMC step program.

Traces a SHORT scan (default 20 steps — the full 391-step epoch trace
hangs over the remote-device tunnel, see PERF.md) of exactly the
bench.py K=8 bf16 program, then parses the xplane.pb with xprof into
(a) the op-profile MXU/HBM rollup and (b) a per-op self-time table.

Usage: python experiments/perf/op_profile.py [K] [n_steps] [packing]
Writes /tmp/xprof_trace/... and prints the top-op table.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1].parent))


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[2] / ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from bnn_priors_tpu import mcmc, models
    import bench

    model = models.ResNet(depth=20, softmax_temp=1.0)
    kernel = mcmc.VerletSGLD(num_data=50000, momentum=0.994,
                             packing=(sys.argv[3] if len(sys.argv) > 3 else "hybrid"))
    run, s, m = bench.build_run(K, model, kernel, n_steps,
                                compute_dtype=(jnp.bfloat16 if K > 1
                                               else None))
    # warm up + compile OUTSIDE the trace; force completion via fetch
    s, m, pot = run(s, m)
    print("warmup pot:", float(pot), flush=True)
    # dump the EXACT compiled HLO so profiler op names resolve to shapes
    try:
        jf = getattr(run, "_jitted", run)
        Path("/tmp/k8.hlo").write_text(jf.lower(s, m).compile().as_text())
        print("wrote /tmp/k8.hlo", flush=True)
    except Exception as e:  # noqa: BLE001
        print("hlo dump failed:", e, flush=True)

    trace_dir = "/tmp/xprof_trace"
    with jax.profiler.trace(trace_dir):
        s, m, pot = run(s, m)
        float(pot)  # force completion inside the trace
    print("traced", flush=True)

    pbs = sorted(Path(trace_dir).rglob("*.xplane.pb"))
    assert pbs, "no xplane.pb produced"
    paths = [str(pbs[-1])]

    from xprof.convert import raw_to_tool_data

    # per-op table (self time, occurrences)
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "framework_op_stats",
                                                   {})
    if isinstance(data, bytes):
        data = data.decode()
    out = Path("/tmp/op_stats.json")
    out.write_text(data if isinstance(data, str) else json.dumps(data))
    print("wrote", out)

    try:
        prof, _ = raw_to_tool_data.xspace_to_tool_data(paths, "op_profile", {})
        if isinstance(prof, bytes):
            prof = prof.decode()
        Path("/tmp/op_profile.json").write_text(
            prof if isinstance(prof, str) else json.dumps(prof))
        print("wrote /tmp/op_profile.json")
    except Exception as e:  # noqa: BLE001
        print("op_profile tool failed:", e)


if __name__ == "__main__":
    main()
