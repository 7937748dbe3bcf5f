"""Step-granular metrics streaming + per-epoch test evaluation in the
multi-chain runners (reference cadence: inference.py:262-294 logging,
inference.py:199-213 per-epoch eval)."""
import collections

import jax
import jax.numpy as jnp
import numpy as np

from bnn_priors_tpu import models
from bnn_priors_tpu.parallel import MultiChainRunner, MultiChainRunnerReject


class RecordingSaver:
    "metrics-saver test double: records (name -> [(step, value)])"

    def __init__(self):
        self.series = collections.defaultdict(list)
        self.flushes = 0

    def add_scalar(self, name, value, step):
        self.series[name].append((step, value))

    def flush(self, every_s=0, keep_last_row=False):
        self.flushes += 1


def _toy(n=48, d=4, key=0):
    k1, k2 = jax.random.split(jax.random.key(key))
    x = jax.random.normal(k1, (n, d))
    y = (jax.random.normal(k2, (n,)) > 0).astype(jnp.int32)
    return x, y


def _mk(runner_cls, n_chains=3, metrics_skip=1, **kw):
    x, y = _toy()
    xt, yt = _toy(n=20, key=7)
    model = models.LogisticRegression(4, 2)
    savers = [RecordingSaver() for _ in range(n_chains)]
    r = runner_cls(
        model, (x, y), n_chains=n_chains, temperatures=[0.5, 1.0, 1.0],
        learning_rate=1e-3, momentum=0.9, batch_size=16, cycles=2,
        epochs_per_cycle=2, warmup_epochs=1, sample_epochs=1,
        key=jax.random.key(5), metrics_savers=savers,
        metrics_skip=metrics_skip, test_data=(xt, yt), **kw)
    return r, savers


def test_step_series_lengths_and_cadence():
    # 48/16 = 3 steps/epoch, 2 cycles x 2 epochs = 4 epochs, 12 steps
    r, savers = _mk(MultiChainRunner, metrics_skip=2)
    hist = r.run()
    for sv in savers:
        pot = sv.series["potential"]
        # steps 0..11; logged when step % 2 == 0 OR first-of-epoch
        # (epoch starts: 0, 3, 6, 9) -> {0,2,3,4,6,8,9,10} = 8 rows
        assert len(pot) == 8, [s for s, _ in pot]
        assert [s for s, _ in pot] == [x - 1 for x in (0, 2, 3, 4, 6, 8, 9, 10)]
        # per-leaf est_temperature series exist with the same cadence
        leaf_names = [k for k in sv.series if k.startswith("est_temperature/")
                      and not k.endswith("/all")]
        assert leaf_names
        for k in leaf_names:
            assert len(sv.series[k]) == 8
        assert len(sv.series["est_temperature/all"]) == 8
        assert len(sv.series["preconditioner/" + leaf_names[0].split("/", 1)[1]]) == 8
        # timings per epoch
        assert len(sv.series["timings/steps_per_s"]) == 4
        assert len(sv.series["timings/aggregate_steps_per_s"]) == 4
    # history still carries aggregated epoch-end diagnostics
    assert len(hist) == 4
    assert hist[0]["est_temperature"].shape == (3,)


def test_per_chain_temperature_column():
    # epochs_per_cycle=3 with warmup 1 + sample 1 -> 1 DESCENT epoch/cycle
    x, y = _toy()
    model = models.LogisticRegression(4, 2)
    savers = [RecordingSaver() for _ in range(3)]
    r = MultiChainRunner(
        model, (x, y), n_chains=3, temperatures=[0.5, 1.0, 1.0],
        learning_rate=1e-3, momentum=0.9, batch_size=16, cycles=1,
        epochs_per_cycle=3, warmup_epochs=1, sample_epochs=1,
        key=jax.random.key(5), metrics_savers=savers)
    r.run()
    # descent epoch rows log T=0; warmup/sampling rows the chain's own T
    for c, sv in enumerate(savers):
        temps = [v for _, v in sv.series["temperature"]]
        expect = float([0.5, 1.0, 1.0][c])
        assert temps[0] == 0.0            # descent epoch rows
        assert temps[-1] == expect        # sampling epoch rows


def test_test_eval_streams_and_matches_final_state():
    r, savers = _mk(MultiChainRunner)
    hist = r.run()
    for sv in savers:
        acc = sv.series["test/acc"]
        assert len(acc) == 4              # one per epoch
        assert all(0.0 <= v <= 1.0 for _, v in acc)
    assert hist[-1]["test/acc"].shape == (3,)
    # the last epoch's streamed test/acc must equal evaluating the final
    # chain positions directly (positions unchanged after the last eval)
    lp, acc = r._eval_fn(r.states.position, r.model_states,
                         *r._eval_batches)
    np.testing.assert_allclose(np.asarray(acc),
                               hist[-1]["test/acc"], rtol=1e-12)


def test_boundary_rows_reject():
    r, savers = _mk(MultiChainRunnerReject)
    r.run()
    n_boundaries = len(r.rejections)
    assert n_boundaries == 2
    for c, sv in enumerate(savers):
        de = sv.series["delta_energy"]
        assert len(de) == n_boundaries
        np.testing.assert_allclose(
            [v for _, v in de],
            [float(d[c]) for d in r.delta_energies], rtol=1e-6)
        te = [v for _, v in sv.series["total_energy"]]
        np.testing.assert_allclose(te[-1], sum(v for _, v in de), rtol=1e-6)
        assert len(sv.series["acceptance/rejected"]) == n_boundaries
        assert len(sv.series["exact/potential"]) == n_boundaries
        assert len(sv.series["acceptance/is_sample"]) == n_boundaries


def test_hdf5_roundtrip(tmp_path):
    "the streamed series survive a real HDF5Metrics writer"
    from bnn_priors_tpu.io import HDF5Metrics
    import h5py
    x, y = _toy()
    model = models.LogisticRegression(4, 2)
    paths = [tmp_path / f"m{c}.h5" for c in range(2)]
    savers = [HDF5Metrics(str(p)) for p in paths]
    r = MultiChainRunner(
        model, (x, y), n_chains=2, learning_rate=1e-3, momentum=0.9,
        batch_size=16, cycles=1, epochs_per_cycle=2, warmup_epochs=1,
        sample_epochs=1, key=jax.random.key(6), metrics_savers=savers,
        test_data=_toy(n=20, key=7))
    r.run()
    for s in savers:
        s.close()
    with h5py.File(paths[0], "r") as f:
        assert "potential" in f and "test/acc" in f
        assert "est_temperature/all" in f
        vals = np.asarray(f["potential"]["values"]
                          if isinstance(f["potential"], h5py.Group)
                          else f["potential"])
        assert np.isfinite(vals).any()


def test_pipeline_equivalence(tmp_path):
    """The one-epoch-deep dispatch pipeline (VERDICT r4 item 1) is pure
    reordering of host work: metrics.h5 and the sample banks must be
    IDENTICAL to the synchronous (pipeline=False) run."""
    import h5py

    from bnn_priors_tpu.io import HDF5Metrics, HDF5ModelSaver
    from bnn_priors_tpu.parallel import MultiChainRunnerReject

    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (48, 4))
    y = (jax.random.normal(ky, (48,)) > 0).astype(jnp.int32)
    model = models.LogisticRegression(4, 2)

    def run(pipeline, d):
        d.mkdir()
        ms = [HDF5Metrics(d / f"m{c}.h5") for c in range(3)]
        sv = [HDF5ModelSaver(d / f"s{c}.h5") for c in range(3)]
        r = MultiChainRunnerReject(
            model, (x, y), n_chains=3, temperatures=[0.1, 1.0, 1.0],
            kernel="VerletSGLD", learning_rate=1e-3, momentum=0.9,
            batch_size=16, cycles=2, epochs_per_cycle=3, warmup_epochs=2,
            sample_epochs=1, key=jax.random.key(3), dtype=jnp.float64,
            metrics_savers=ms, metrics_skip=2, model_savers=sv,
            test_data=(x, y), pipeline=pipeline)
        hist = r.run()
        for s in ms + sv:
            s.close()
        return hist

    h_pipe = run(True, tmp_path / "pipe")
    h_sync = run(False, tmp_path / "sync")
    assert len(h_pipe) == len(h_sync)
    for ep, es in zip(h_pipe, h_sync):
        assert set(ep) == set(es)
        for k in ep:
            np.testing.assert_array_equal(np.asarray(ep[k]),
                                          np.asarray(es[k]), err_msg=k)
    for c in range(3):
        for fn in (f"m{c}.h5", f"s{c}.h5"):
            with h5py.File(tmp_path / "pipe" / fn) as fp, \
                    h5py.File(tmp_path / "sync" / fn) as fs:
                # wall-clock records legitimately differ between modes
                # (wall_s exists only when pipelined)
                kp = set(fp.keys()) - {"timings"}
                ks = set(fs.keys()) - {"timings"}
                assert kp == ks, fn
                for k in kp:
                    if k == "timestamps":
                        continue
                    np.testing.assert_array_equal(
                        np.asarray(fp[k]), np.asarray(fs[k]),
                        err_msg=f"{fn}/{k}")


def test_snapshot_sample_is_a_real_copy():
    """The staged sample must not share device buffers with the live
    chain state: jit FORWARDS pass-through outputs (dict(ms), same-shape
    reshapes of hybrid/segmented native leaves), and the next donating
    dispatch overwrites the live buffers under the pipelined drain
    (round-5 code-review finding, fixed by forcing a computation per
    leaf)."""
    from bnn_priors_tpu.parallel import MultiChainRunner

    kx, ky = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kx, (32, 3 * 8 * 8))
    y = (jax.random.normal(ky, (32,)) > 0).astype(jnp.int32)
    model = models.ClassificationConvNet(3, 8, 2, width=8, depth=3)

    class _NullSaver:
        def add_state_dict(self, *a, **k):
            pass

        def close(self):
            pass

    def live_ptrs(runner):
        out = set()
        for leaf in jax.tree_util.tree_leaves(
                (runner.states.position, dict(runner.model_states))):
            try:
                out.add(leaf.unsafe_buffer_pointer())
            except Exception:
                pass
        return out

    for savers in ([_NullSaver(), _NullSaver()], None):  # unpacked, packed
        runner = MultiChainRunner(
            model, (x, y), n_chains=2, temperatures=1.0,
            kernel="VerletSGLD", learning_rate=1e-3, momentum=0.9,
            batch_size=16, cycles=1, epochs_per_cycle=1, warmup_epochs=0,
            sample_epochs=1, key=jax.random.key(5), dtype=jnp.float64,
            packing="hybrid", model_savers=savers)
        kind, params, ms = runner._snapshot_sample()
        assert kind == ("unpacked" if savers else "packed")
        live = live_ptrs(runner)
        snap_leaves = jax.tree_util.tree_leaves((params, ms))
        assert snap_leaves
        for leaf in snap_leaves:
            try:
                p = leaf.unsafe_buffer_pointer()
            except Exception:
                continue
            assert p not in live, "snapshot aliases the live chain state"
