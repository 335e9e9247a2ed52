"""End-to-end tiny GAN training: dataset -> loader -> jitted step -> events ->
checkpoints -> resume."""
import os

import numpy as np
from PIL import Image
import jax
import jax.numpy as jnp
import pytest

from gandtr_tpu.data.datasets import RandomDomainsPairDataset, Loader
from gandtr_tpu.data.transforms import initialize_transforms
from gandtr_tpu.learning.network import build_model_set
from gandtr_tpu.learning.optimizers import initialize_optimizer
from gandtr_tpu.learning import gan_steps
from gandtr_tpu.learning.schedules import initialize_schedule
from gandtr_tpu.learning.events import initialize_processor
from gandtr_tpu.learning.checkpoints import Checkpoints
from gandtr_tpu.learning.training import Training, VisualValidation


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img{i}.jpg")
    return str(d)


def test_tiny_gan_training_with_resume(image_dir, tmp_path):
    names = sorted(os.listdir(image_dir))
    tf = initialize_transforms("pil2np | scalecrop:32_32:0.8_1 | totensor | normalize",
                               [[0.5] * 3, [0.5] * 3])
    ds = RandomDomainsPairDataset([], tf, names[:3], names[3:], image_dir + "/*",
                                  size=4)
    loader = Loader(ds, batch_size=2, shuffle=True, drop_last=True, num_workers=1)

    cfg = {"type": "NetworkSet",
           "generator_X": {"model": {"architecture": "official_resnet_generator",
                                     "ngf": 4, "n_blocks": 1,
                                     "norm_layer": "instance"},
                           "runtime": {"wrappers": "", "data": {}}},
           "discriminator_Y": {"model": {"architecture": "official_p2p_discriminator",
                                         "ndf": 4, "n_layers": 2,
                                         "norm_layer": "instance"},
                               "runtime": {"wrappers": "", "data": {}}}}
    ms, _ = build_model_set(cfg)
    x0 = jnp.zeros((2, 32, 32, 3))
    variables = ms.init_all(jax.random.PRNGKey(0), {n: x0 for n in ms.nets})
    adam_cfg = {"algorithm": "adam", "lr": 2e-4, "beta1": 0.5, "beta2": 0.999}
    optimizers, base_lr = {}, {}
    for n in ("generator_X", "discriminator_Y"):
        optimizers[n], base_lr[n] = initialize_optimizer(dict(adam_cfg))
    state = gan_steps.make_gan_state(variables, optimizers)

    # hedgan-without-detector is not a reference config; use a 2-net adversarial
    # step by reusing the hedgan builder with a zero edge weight and an
    # identity detector is overkill — instead use cyclegan-style D/G: simplest
    # smoke: build_hedgan_step requires a detector; use cut without featdown?
    # -> use plain hedgan with detector = identity-ish HED is heavy; so use
    # build_cyclegan? needs 4 nets. Use hedgan with tiny detector:
    cfg_det = {"model": {"architecture": "hed_interpolation", "width_mult": 0.0625},
               "runtime": {"wrappers": "", "data": {}}}
    from gandtr_tpu.learning.network import build_single_net
    det = build_single_net(cfg_det)
    ms.nets["detector"] = det
    variables["detector"] = dict(det.init(jax.random.PRNGKey(1), x0))
    optimizers["detector"], base_lr["detector"] = initialize_optimizer(dict(adam_cfg))
    state = gan_steps.make_gan_state(variables, optimizers)

    step = jax.jit(gan_steps.build_hedgan_step(
        ms.nets, optimizers, {"adversarial": 1, "edge": 5}))

    schedules = {n: initialize_schedule(4, {"algorithm": "lambda_p2p",
                                            "n_epochs_decay": 2})
                 for n in optimizers}
    events = initialize_processor({"progress": {"print_each": 100}},
                                  directory=str(tmp_path))
    ckpts = Checkpoints(str(tmp_path), store_every=2, checkpoint_every=1)
    val_images = jnp.zeros((1, 32, 32, 3))
    training = Training(
        step_fn=step, loader=loader, epochs=2, seed=0,
        optimizers_base_lr=base_lr, schedules=schedules, events=events,
        checkpoints=ckpts,
        validations=[VisualValidation(ms["generator_X"].module, val_images)],
        batch_to_args=lambda b: (jnp.asarray(b[0]), jnp.asarray(b[1])))

    final = training.run(state)
    assert int(final.step) == 4  # 2 epochs x 2 batches

    # events recorded
    assert len(events.history) == 2
    assert "train/learning/total" in events.history[0]["metrics"]
    # checkpoints on disk with best/last links
    eps = os.listdir(os.path.join(str(tmp_path), "epochs"))
    assert any("generator_X_best" in e for e in eps)
    assert any("generator_X_epoch_02" in e for e in eps)
    # blobs from visual validation
    blobs = os.listdir(os.path.join(str(tmp_path), "epochs", "blobs"))
    assert blobs
    # traindata sample blobs (reference supervised_epoch.py:194-199: epoch 1
    # + every LOG_TRAINDATA_SAMPLE_EVERY): hedgan debug dict -> rgb samples
    samples = [b for b in blobs if b.startswith("data_")]
    assert any("image0.rgb_epoch_01" in b for b in samples), blobs
    assert any("fake_Y" in b for b in samples), samples

    # resume: fresh state, reload epoch 2
    state2 = gan_steps.make_gan_state(variables, optimizers)
    events2 = initialize_processor({}, directory=str(tmp_path))
    training2 = Training(
        step_fn=step, loader=loader, epochs=4, seed=0,
        optimizers_base_lr=base_lr, schedules=schedules, events=events2,
        checkpoints=Checkpoints(str(tmp_path), store_every=2, checkpoint_every=1),
        batch_to_args=lambda b: (jnp.asarray(b[0]), jnp.asarray(b[1])))
    state2, start = training2.resume_or_start(state2)
    assert start == 3
    # resumed weights equal saved ones
    gx = final.variables["generator_X"]["params"]
    gx2 = state2.variables["generator_X"]["params"]
    d = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), gx, gx2)))
    assert d == 0.0
    # aux training state (Adam moments, replay pools, rng, step) restored —
    # NOT re-initialized (the reference reloads optimizer state on resume)
    assert int(state2.step) == int(final.step)
    np.testing.assert_array_equal(np.asarray(state2.rng),
                                  np.asarray(final.rng))
    for tree_a, tree_b, what in ((final.opt_states, state2.opt_states, "opt"),
                                 (final.pools, state2.pools, "pools")):
        la = jax.tree_util.tree_leaves(tree_a)
        lb = jax.tree_util.tree_leaves(tree_b)
        assert len(la) == len(lb), what
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=what)
    # continue to epoch 4
    final2 = training2.run(state2, start_epoch=start)
    assert len(events2.history) == 4  # 2 replayed + epochs 3, 4


class TestHtmlReport:
    def test_report_renders_curves_and_thumbs(self, tmp_path):
        from gandtr_tpu.learning.html_report import HtmlReport
        from PIL import Image as _Image
        import numpy as _np

        blobs = tmp_path / "epochs" / "blobs"
        blobs.mkdir(parents=True)
        _Image.fromarray(_np.zeros((8, 8, 3), _np.uint8)).save(
            blobs / "sample_e1.jpg")
        rep = HtmlReport(str(tmp_path))
        history = [{"metrics": {"train/learning/total": 1.0 - 0.1 * i,
                                "val/score": 0.5 + 0.05 * i}}
                   for i in range(4)]
        rep.close_epoch(4, history=history)
        doc = (tmp_path / "epochs" / "htmlreport" / "index.html").read_text()
        assert "train/learning/total" in doc and "val/score" in doc
        assert "<svg" in doc and "polyline" in doc  # curves rendered
        assert "sample_e1.jpg" in doc               # thumbnail grid
        assert "epoch 4" in doc

    def test_combined_multiplot_and_section_order(self, tmp_path):
        """A key group with several series gets ONE combined multi-series
        chart (the reference's loss multiplot, eventprocessor.py:526-535),
        and sections follow the reference order (train/learning first,
        val/learning second — :574)."""
        from gandtr_tpu.learning.html_report import HtmlReport
        rep = HtmlReport(str(tmp_path))
        history = [{"metrics": {"train/learning/total": 1.0 - 0.1 * i,
                                "train/learning/G_gan": 0.5 - 0.02 * i,
                                "train/learning/D_fake": 0.3 + 0.01 * i,
                                "val/learning/loss:total": 0.9 - 0.05 * i,
                                "zz_other/metric": float(i)}}
                   for i in range(3)]
        rep.close_epoch(3, history=history)
        doc = (tmp_path / "epochs" / "htmlreport" / "index.html").read_text()
        assert "train/learning/* <small>combined</small>" in doc
        # combined chart holds all three series with a legend
        assert doc.count("G_gan") >= 2  # legend + per-metric section
        # ordering: train/learning section precedes val/learning, which
        # precedes the unknown group
        assert (doc.index("train/learning/total")
                < doc.index("val/learning/loss:total")
                < doc.index("zz_other/metric"))
        # single-series groups get no combined chart
        assert "zz_other/* " not in doc


def test_profile_dir_captures_trace(tmp_path):
    """output.learning.profile captures a jax.profiler trace of one epoch."""
    import glob
    from gandtr_tpu.learning.training import Training

    class OneBatchLoader:
        dataset = object()

        def __iter__(self):
            yield (np.zeros((2, 4), np.float32),)

        def __len__(self):
            return 1

    @jax.jit
    def step(state, x):
        return state + jnp.sum(x), {"total": jnp.sum(x)}

    prof = tmp_path / "prof"
    tr = Training(step_fn=step, loader=OneBatchLoader(), epochs=2,
                  batch_to_args=lambda b: (jnp.asarray(b[0]),),
                  profile_dir=str(prof))
    tr.run(jnp.float32(0.0))
    traces = glob.glob(str(prof / "**" / "*.trace*"), recursive=True) + \
        glob.glob(str(prof / "**" / "*.pb"), recursive=True) + \
        glob.glob(str(prof / "**" / "*.xplane.pb"), recursive=True)
    assert traces, list(map(str, prof.rglob("*")))


def test_schedule_applies_to_single_opt_state_finetune():
    """Training._apply_schedules must handle FinetuneState's single
    `opt_state` (the schedule used to be silently skipped: run() gated on
    `opt_states` and the adapter hook was never invoked — found by review)."""
    import jax
    import jax.numpy as jnp
    from gandtr_tpu.learning import supervised
    from gandtr_tpu.learning.optimizers import initialize_optimizer
    from gandtr_tpu.learning.training import Training
    from gandtr_tpu.learning.schedules import gamma_schedule

    tx, base_lr = initialize_optimizer({"algorithm": "adam", "lr": 1e-3,
                                        "beta1": 0.9, "beta2": 0.999})
    variables = {"embed": {"params": {"w": jnp.ones((2, 2))}}}
    state = supervised.make_finetune_state(variables, tx)
    tr = Training(step_fn=None, loader=None, epochs=3, seed=0,
                  optimizers_base_lr={"embed": base_lr},
                  schedules={"embed": gamma_schedule(3, 0.5)})
    s1 = tr._apply_schedules(state, epoch=1)
    s2 = tr._apply_schedules(state, epoch=2)
    lr1 = float(s1.opt_state.hyperparams["learning_rate"])
    lr2 = float(s2.opt_state.hyperparams["learning_rate"])
    assert lr1 == pytest.approx(1e-3)        # gamma^0: first epoch undecayed
    assert lr2 == pytest.approx(1e-3 * 0.5)  # gamma^1


def test_gamma_schedule_matches_torch_exponential_lr():
    """factor(e) == ExponentialLR's lr multiplier during 0-indexed epoch e."""
    torch = pytest.importorskip("torch")
    from gandtr_tpu.learning.schedules import gamma_schedule
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.9)
    factor = gamma_schedule(5, 0.9)
    for e in range(5):
        assert opt.param_groups[0]["lr"] == pytest.approx(factor(e))
        sched.step()


class TestResumeConfigAssert:
    """Reference learning.py:46-50: resuming under a changed validation or
    dataset config must fail loudly, not silently continue."""

    def _train(self, tmp_path, snapshot):
        from gandtr_tpu.learning.training import Training
        from gandtr_tpu.learning.checkpoints import Checkpoints

        class FakeState:
            variables = {"gen": {"params": {"w": np.zeros(3)}}}

            def replace(self, **kw):
                new = FakeState()
                for k, v in kw.items():
                    setattr(new, k, v)
                return new

        class Loader(list):
            dataset = object()

        def step_fn(state, batch):
            return state, {"total": 0.0}

        t = Training(step_fn=step_fn, loader=Loader([(np.zeros(1),)]),
                     epochs=1, config_snapshot=snapshot,
                     checkpoints=Checkpoints(str(tmp_path), store_every=1,
                                             checkpoint_every=1))
        return t, FakeState()

    def test_same_config_resumes(self, tmp_path):
        snap = {"validation": {"frequency": 5}, "datasets": {"d": 1}}
        t, state = self._train(tmp_path, snap)
        t.run(state)
        t2, state2 = self._train(tmp_path, dict(snap))
        _, start = t2.resume_or_start(state2)
        assert start == 2

    def test_changed_config_refuses(self, tmp_path):
        t, state = self._train(tmp_path, {"validation": {"frequency": 5},
                                          "datasets": {"d": 1}})
        t.run(state)
        t2, state2 = self._train(tmp_path, {"validation": {"frequency": 1},
                                            "datasets": {"d": 1}})
        with pytest.raises(RuntimeError, match="resume config mismatch"):
            t2.resume_or_start(state2)


class _StubEvents:
    """Captures logger rows so chunked/plain event streams can be compared."""

    def __init__(self):
        self.rows = []

    def logger(self, prefix, epoch, n=None):
        def log(key, value, dtype, iteration=None):
            self.rows.append((iteration, key, float(value)))
        return log


def test_chunked_epoch_loop_matches_plain():
    """dispatch_chunk semantics: build_chunk_fn scans the SAME step in the
    same order — states, per-iteration metric stream, and last debug must
    match the plain loop (incl. an uneven tail: 7 batches, chunk 3)."""
    from gandtr_tpu.learning.training import EpochLoop

    rng = np.random.RandomState(0)
    batches = [(rng.randn(2, 4).astype(np.float32),
                rng.randn(2, 4).astype(np.float32)) for _ in range(7)]

    class FakeLoader:
        dataset = object()

        def __iter__(self):
            return iter(batches)

        def __len__(self):
            return len(batches)

    @jax.jit
    def step(s, x, y):
        w = s["w"] * 0.9 + x.sum() - 0.5 * y.sum()
        return ({"w": w, "n": s["n"] + 1},
                {"loss": x.mean() + s["w"]},
                {"img": x[0] + s["w"]})

    state0 = {"w": jnp.float32(1.0), "n": jnp.int32(0)}
    b2a = lambda b: (jnp.asarray(b[0]), jnp.asarray(b[1]))  # noqa: E731
    c2a = lambda bs: (jnp.asarray(np.stack([b[0] for b in bs])),  # noqa: E731
                      jnp.asarray(np.stack([b[1] for b in bs])))

    ev_plain, ev_chunk = _StubEvents(), _StubEvents()
    plain = EpochLoop(step, FakeLoader(), events=ev_plain,
                      batch_to_args=b2a)
    s_p, dbg_p = plain.run_epoch(state0, 1)
    chunked = EpochLoop(step, FakeLoader(), events=ev_chunk,
                        batch_to_args=b2a, chunk=3, chunk_to_args=c2a)
    s_c, dbg_c = chunked.run_epoch(state0, 1)

    assert int(s_p["n"]) == int(s_c["n"]) == 7
    np.testing.assert_allclose(float(s_p["w"]), float(s_c["w"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dbg_p["img"]),
                               np.asarray(dbg_c["img"]), rtol=1e-6)
    assert len(ev_plain.rows) == len(ev_chunk.rows) == 7
    for (i1, k1, v1), (i2, k2, v2) in zip(ev_plain.rows, ev_chunk.rows):
        assert (i1, k1) == (i2, k2)
        np.testing.assert_allclose(v1, v2, rtol=1e-6, err_msg=str((i1, k1)))


def test_dispatch_chunk_wires_through_gan_build(tmp_path):
    """`learning.training.dispatch_chunk` reaches the epoch loop, and a
    chunked micro train epoch equals the unchunked one (cyclegan family —
    exercises pools + rng threading through lax.scan)."""
    from test_dp_train_stage import _scenario
    from gandtr_tpu.scenarios.build import build_gan_experiment

    runs = {}
    for chunk in (0, 2):
        sc = _scenario(parallel=False)
        sc["learning"]["training"]["dispatch_chunk"] = chunk
        # SGD, not Adam: chunked/plain is a float-level variant comparison
        # (scan fuses differently than standalone dispatches) and Adam
        # amplifies ulp grad noise into ±lr sign flips at near-zero grads
        # (CLAUDE.md round-4) — SGD keeps param diffs at true float noise
        sc["learning"]["training"]["optimizer"] = {
            n: {"algorithm": "sgd", "lr": 1e-3}
            for n in ("generator_X", "discriminator_Y")}
        exp = build_gan_experiment(sc, sample_hw=16, batch_size=2,
                                   data_override={})
        assert exp["training"] is None  # no loader in data_override
        loop_chunk = chunk
        # drive EpochLoop directly with synthetic batches
        from gandtr_tpu.learning.training import EpochLoop
        rng = np.random.RandomState(3)
        batches = [(rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1,
                    rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1)
                   for _ in range(4)]

        class FakeLoader:
            dataset = object()

            def __iter__(self):
                return iter(batches)

            def __len__(self):
                return len(batches)

        ev = _StubEvents()
        c2a = lambda bs: (jnp.asarray(np.stack([b[0] for b in bs])),  # noqa: E731
                          jnp.asarray(np.stack([b[1] for b in bs])))
        loop = EpochLoop(
            exp["step"], FakeLoader(), events=ev,
            batch_to_args=lambda b: (jnp.asarray(b[0]), jnp.asarray(b[1])),
            chunk=loop_chunk, chunk_to_args=c2a if loop_chunk else None)
        state, _ = loop.run_epoch(exp["state"], 1)
        runs[chunk] = (state, ev.rows)

    s0, rows0 = runs[0]
    s2, rows2 = runs[2]
    assert int(s0.step) == int(s2.step) == 4
    for (i1, k1, v1), (i2, k2, v2) in zip(rows0, rows2):
        assert (i1, k1) == (i2, k2)
        np.testing.assert_allclose(v1, v2, rtol=2e-5, atol=1e-6,
                                   err_msg=str((i1, k1)))
    d = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        s0.variables["generator_X"]["params"],
        s2.variables["generator_X"]["params"])))
    assert d < 1e-5, d
