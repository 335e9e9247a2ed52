"""Differential fuzz of optimizers + LR schedules vs the reference's ACTUAL
optim package (base_optimizers.py / base_schedulers.py, loaded standalone;
torch CPU).

Optimizers: identical gradient sequences drive torch adam/sgd and our optax
chains over random param trees — torch-style L2 weight decay (coupled, not
AdamW), sgd momentum buffers (first step = raw grad), adam bias correction and
eps placement must all match within f32 tolerance.

Schedules: for every base scheduler (const/lambda/lambda_p2p/gamma incl. the
"exp(x)" string form), the reference steps a torch scheduler once per epoch
(close_epoch); our pure epoch->factor functions must reproduce the lr the
torch optimizer saw DURING each epoch, including mid-trajectory resume
(last_epoch > -1 reconstruction).

Reference: /root/reference/mdir/components/optim/optimizer/base_optimizers.py,
/root/reference/mdir/components/optim/scheduler/base_schedulers.py.
"""
import os
import random
import sys
import importlib.util as ilu

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_OPT = "/root/reference/mdir/components/optim/optimizer/base_optimizers.py"
_SCH = "/root/reference/mdir/components/optim/scheduler/base_schedulers.py"

needs_reference = pytest.mark.skipif(not os.path.isfile(_OPT),
                                     reason="reference tree not mounted")


def _load(fullname, path):
    spec = ilu.spec_from_file_location(fullname, path)
    mod = ilu.module_from_spec(spec)
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_optim():
    return _load("ref_base_optimizers", _OPT)


@pytest.fixture(scope="module")
def ref_sched():
    return _load("ref_base_schedulers", _SCH)


def _rand_tree(rng, ntensors):
    shapes = [tuple(rng.randint(1, 5) for _ in range(rng.randint(1, 3)))
              for _ in range(ntensors)]
    return [np.asarray(rng.randn(*s), np.float32) for s in shapes]


@needs_reference
class TestOptimizerDifferential:
    def _drive(self, ref_optim, opt_params, nsteps, seed, lr_factors=None):
        """Run torch and ours on identical grads; return (torch, ours) params."""
        import jax.numpy as jnp
        from gandtr_tpu.learning.optimizers import (initialize_optimizer,
                                                    set_learning_rate)

        rng = np.random.RandomState(seed)
        init = _rand_tree(rng, rng.randint(1, 4))
        grads = [[np.asarray(rng.randn(*p.shape), np.float32) for p in init]
                 for _ in range(nsteps)]

        # torch
        tparams = [torch.nn.Parameter(torch.from_numpy(p.copy()))
                   for p in init]
        topt = ref_optim.initialize_base_optimizer(tparams, dict(opt_params))
        base_lr = opt_params["lr"]
        for step in range(nsteps):
            if lr_factors is not None:
                for g in topt.param_groups:
                    g["lr"] = base_lr * lr_factors[step]
            topt.zero_grad()
            for p, g in zip(tparams, grads[step]):
                p.grad = torch.from_numpy(g.copy())
            topt.step()
        torch_final = [p.detach().numpy() for p in tparams]

        # ours
        tx, _ = initialize_optimizer(dict(opt_params))
        jparams = [jnp.asarray(p) for p in init]
        state = tx.init(jparams)
        for step in range(nsteps):
            if lr_factors is not None:
                state = set_learning_rate(state, base_lr * lr_factors[step])
            updates, state = tx.update(
                [jnp.asarray(g) for g in grads[step]], state, jparams)
            import optax
            jparams = optax.apply_updates(jparams, updates)
        ours_final = [np.asarray(p) for p in jparams]
        return torch_final, ours_final

    @pytest.mark.parametrize("seed", range(6))
    def test_adam_fuzz(self, ref_optim, seed):
        rng = random.Random(1000 + seed)
        params = {"algorithm": "adam",
                  "lr": rng.choice([1e-1, 1e-2, 5e-4, 2e-4]),
                  "beta1": rng.choice([0.5, 0.9]),
                  "beta2": rng.choice([0.999, 0.99]),
                  "weight_decay": rng.choice([0.0, 5e-4, 1e-2])}
        t, o = self._drive(ref_optim, params, nsteps=rng.randint(1, 12),
                           seed=seed)
        for a, b in zip(t, o):
            np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)

    @pytest.mark.parametrize("seed", range(6))
    def test_sgd_fuzz(self, ref_optim, seed):
        rng = random.Random(2000 + seed)
        params = {"algorithm": "sgd",
                  "lr": rng.choice([1e-1, 1e-2, 1e-3]),
                  "momentum": rng.choice([0.0, 0.9, 0.99]),
                  "weight_decay": rng.choice([0.0, 5e-4, 1e-2])}
        t, o = self._drive(ref_optim, params, nsteps=rng.randint(1, 12),
                           seed=seed)
        for a, b in zip(t, o):
            np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)

    def test_adam_with_scheduled_lr(self, ref_optim):
        """Per-epoch LR injection (our set_learning_rate path) must equal
        torch param-group lr mutation — moments must carry across changes."""
        factors = [1.0, 1.0, 0.75, 0.5, 0.25, 0.1]
        params = {"algorithm": "adam", "lr": 2e-2, "beta1": 0.5,
                  "beta2": 0.999, "weight_decay": 5e-4}
        t, o = self._drive(ref_optim, params, nsteps=len(factors), seed=77,
                           lr_factors=factors)
        for a, b in zip(t, o):
            np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)


@needs_reference
class TestSchedulerDifferential:
    def _torch_lrs(self, ref_sched, algorithm, nepochs, base_lr, **kw):
        """The lr a reference training sees during each epoch 1..nepochs:
        scheduler constructed with last_epoch=-1, stepped at close_epoch."""
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=base_lr, momentum=0.0, weight_decay=0.0)
        sched = ref_sched.initialize_base_scheduler(
            opt, -1, nepochs, {"algorithm": algorithm, **kw})
        lrs = []
        for _ in range(1, nepochs + 1):
            lrs.append(opt.param_groups[0]["lr"])
            opt.step()  # silence the torch step-order warning
            sched.step()
        return lrs

    def _ours_lrs(self, algorithm, nepochs, base_lr, **kw):
        from gandtr_tpu.learning.schedules import initialize_schedule
        factor = initialize_schedule(nepochs, {"algorithm": algorithm, **kw})
        return [base_lr * factor(e - 1) for e in range(1, nepochs + 1)]

    @pytest.mark.parametrize("seed", range(12))
    def test_fuzz_all_algorithms(self, ref_sched, seed):
        rng = random.Random(3000 + seed)
        nepochs = rng.randint(1, 40)
        base_lr = rng.choice([1e-1, 2e-4, 5e-7])
        algorithm = rng.choice(["const", "lambda", "lambda_p2p", "gamma"])
        kw = {}
        if algorithm == "lambda":
            kw["fixed_ratio"] = rng.choice([0.25, 0.5, 0.75])
        elif algorithm == "lambda_p2p":
            kw["n_epochs_decay"] = rng.randint(0, nepochs)
        elif algorithm == "gamma":
            kw["gamma"] = rng.choice([0.99, 0.9, "exp(-0.01)", "exp(-0.1)"])
        ref = self._torch_lrs(ref_sched, algorithm, nepochs, base_lr, **kw)
        got = self._ours_lrs(algorithm, nepochs, base_lr, **kw)
        np.testing.assert_allclose(got, ref, rtol=1e-9, atol=0,
                                   err_msg="%s nepochs=%d kw=%s"
                                           % (algorithm, nepochs, kw))

    def test_resume_mid_trajectory(self, ref_sched):
        """Resume at epoch k exactly like the reference: the saved optimizer
        state_dict (post-close_epoch lr, learning.py:62-74) is loaded into a
        fresh optimizer, then the scheduler is rebuilt with last_epoch=k-1
        (training.py:62-73). Our factor function is stateless so the SAME
        epoch->lr mapping must fall out."""
        nepochs, base_lr, k = 20, 1e-2, 8
        for algorithm, kw in (("lambda", {"fixed_ratio": 0.5}),
                              ("lambda_p2p", {"n_epochs_decay": 10}),
                              ("gamma", {"gamma": 0.95})):
            # full run up to k, saving the optimizer state after close_epoch
            p = torch.nn.Parameter(torch.zeros(1))
            opt = torch.optim.SGD([p], lr=base_lr)
            sched = ref_sched.initialize_base_scheduler(
                opt, -1, nepochs, {"algorithm": algorithm, **dict(kw)})
            full = []
            for _ in range(1, nepochs + 1):
                full.append(opt.param_groups[0]["lr"])
                opt.step()
                sched.step()
            p2 = torch.nn.Parameter(torch.zeros(1))
            opt2 = torch.optim.SGD([p2], lr=base_lr)
            sched2 = ref_sched.initialize_base_scheduler(
                opt2, -1, nepochs, {"algorithm": algorithm, **dict(kw)})
            for _ in range(k):
                opt2.step()
                sched2.step()
            saved = opt2.state_dict()

            p3 = torch.nn.Parameter(torch.zeros(1))
            opt3 = torch.optim.SGD([p3], lr=base_lr)
            opt3.load_state_dict(saved)
            opt3.param_groups[0].setdefault("initial_lr", base_lr)
            sched3 = ref_sched.initialize_base_scheduler(
                opt3, k - 1, nepochs, {"algorithm": algorithm, **dict(kw)})
            resumed = []
            for _ in range(k + 1, nepochs + 1):
                resumed.append(opt3.param_groups[0]["lr"])
                opt3.step()
                sched3.step()
            assert np.allclose(resumed, full[k:], rtol=1e-9), algorithm
            got = self._ours_lrs(algorithm, nepochs, base_lr, **dict(kw))
            np.testing.assert_allclose(got[k:], resumed, rtol=1e-9,
                                       err_msg=algorithm)


@needs_reference
class TestParamGroupDifferential:
    """Per-group lr/weight-decay multipliers (the reference's
    model.parameter_groups, network.py:66-72) vs actual torch param groups:
    our per-leaf mult trees must reproduce torch exactly for both the cirnet
    spec (pool p lr x10 wd 0; cirnet.py:11-33) and the HED spec (per-layer
    lr/decay multiplier tables; hed.py:86-112)."""

    def _drive_groups(self, ref_optim, opt_params, leaf_specs, nsteps, seed):
        """leaf_specs: list of (shape, lr_mult, wd_mult). Returns final params
        from torch (grouped) and ours (mult trees)."""
        import jax.numpy as jnp
        import optax
        from gandtr_tpu.learning.optimizers import initialize_optimizer

        rng = np.random.RandomState(seed)
        init = [np.asarray(rng.randn(*s), np.float32)
                for s, _, _ in leaf_specs]
        grads = [[np.asarray(rng.randn(*p.shape), np.float32) for p in init]
                 for _ in range(nsteps)]

        # torch with one param group per leaf, like parameter_groups builds
        base_lr = opt_params["lr"]
        base_wd = opt_params.get("weight_decay", 0.0)
        tparams = [torch.nn.Parameter(torch.from_numpy(p.copy()))
                   for p in init]
        groups = [{"params": [p], "lr": base_lr * lm,
                   "weight_decay": base_wd * wm}
                  for p, (_, lm, wm) in zip(tparams, leaf_specs)]
        topt = ref_optim.initialize_base_optimizer(
            groups, {k: v for k, v in opt_params.items()
                     if k not in ("lr", "weight_decay")}
            | {"lr": base_lr, "weight_decay": base_wd})
        for step in range(nsteps):
            topt.zero_grad()
            for p, g in zip(tparams, grads[step]):
                p.grad = torch.from_numpy(g.copy())
            topt.step()
        torch_final = [p.detach().numpy() for p in tparams]

        lr_tree = [lm for _, lm, _ in leaf_specs]
        wd_tree = [wm for _, _, wm in leaf_specs]
        tx, _ = initialize_optimizer(dict(opt_params),
                                     group_mults=(lr_tree, wd_tree))
        jparams = [jnp.asarray(p) for p in init]
        state = tx.init(jparams)
        for step in range(nsteps):
            updates, state = tx.update(
                [jnp.asarray(g) for g in grads[step]], state, jparams)
            jparams = optax.apply_updates(jparams, updates)
        return torch_final, [np.asarray(p) for p in jparams]

    def test_cirnet_spec_adam(self, ref_optim):
        # features x1, gem_p (10, 0), preprocessing (10, 1), whiten x1
        specs = [((3, 4), 1.0, 1.0), ((1,), 10.0, 0.0),
                 ((2, 2), 10.0, 1.0), ((4,), 1.0, 1.0)]
        t, o = self._drive_groups(
            ref_optim, {"algorithm": "adam", "lr": 5e-3, "beta1": 0.9,
                        "beta2": 0.999, "weight_decay": 5e-4},
            specs, nsteps=8, seed=11)
        for a, b in zip(t, o):
            np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)

    def test_hed_spec_adam(self, ref_optim):
        # conv.w/b, conv5.w/b, score.w/b, fusion.w/b multiplier table
        specs = [((3, 3), 1.0, 1.0), ((3,), 2.0, 0.0),
                 ((2, 2), 100.0, 1.0), ((2,), 200.0, 0.0),
                 ((1, 4), 0.01, 1.0), ((1,), 0.02, 0.0),
                 ((1, 5), 0.001, 1.0), ((5,), 0.002, 0.0)]
        t, o = self._drive_groups(
            ref_optim, {"algorithm": "adam", "lr": 1e-4, "beta1": 0.9,
                        "beta2": 0.999, "weight_decay": 2e-4},
            specs, nsteps=8, seed=12)
        for a, b in zip(t, o):
            np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)

    def test_hed_spec_sgd_momentum(self, ref_optim):
        specs = [((3, 3), 1.0, 1.0), ((3,), 2.0, 0.0),
                 ((2, 2), 100.0, 1.0), ((2,), 200.0, 0.0)]
        t, o = self._drive_groups(
            ref_optim, {"algorithm": "sgd", "lr": 1e-3, "momentum": 0.9,
                        "weight_decay": 2e-4},
            specs, nsteps=8, seed=13)
        for a, b in zip(t, o):
            np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-6)


class TestParamGroupMultTrees:
    """param_group_mults must classify real model param trees exactly like
    the reference's parameter_groups walk."""

    def test_cirnet_tree(self):
        import jax
        import jax.numpy as jnp
        from gandtr_tpu.models import initialize_model
        from gandtr_tpu.learning.optimizers import param_group_mults

        net = initialize_model({"architecture": "cirnet",
                                "cir_architecture": "vgg16",
                                "pooling": "gem", "local_whitening": False,
                                "whitening": True, "pretrained": False})
        var = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        lr, wd = param_group_mults("cirnet", var["params"])
        assert lr["gem_p"] == 10.0 and wd["gem_p"] == 0.0
        assert lr["whiten"]["kernel"] == 1.0 and wd["whiten"]["kernel"] == 1.0
        assert all(v == 1.0 for v in jax.tree_util.tree_leaves(lr["backbone"]))

    def test_hed_tree(self):
        import jax
        import jax.numpy as jnp
        from gandtr_tpu.models import initialize_model
        from gandtr_tpu.learning.optimizers import param_group_mults

        net = initialize_model({"architecture": "hed_interpolation",
                                "width_mult": 0.0625})
        var = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        lr, wd = param_group_mults("hed_interpolation", var["params"])
        assert lr["vgg1_0"]["conv"]["kernel"] == 1.0
        assert lr["vgg1_0"]["conv"]["bias"] == 2.0
        assert wd["vgg1_0"]["conv"]["bias"] == 0.0
        assert lr["vgg5_0"]["conv"]["kernel"] == 100.0
        assert lr["vgg5_0"]["conv"]["bias"] == 200.0
        assert lr["score3"]["conv"]["kernel"] == 0.01
        assert lr["score3"]["conv"]["bias"] == 0.02
        assert lr["fusion"]["conv"]["kernel"] == 0.001
        assert lr["fusion"]["conv"]["bias"] == 0.002
        assert wd["fusion"]["conv"]["kernel"] == 1.0

    def test_flat_architectures_get_none(self):
        from gandtr_tpu.learning.optimizers import param_group_mults
        assert param_group_mults("rcf", {"w": 1}) is None
        assert param_group_mults("official_resnet_generator", {"w": 1}) is None


@needs_reference
class TestMultiheadConfigGroups:
    def test_matches_torch_per_net_multipliers(self, ref_optim):
        """Reference MultiheadNetwork config-level parameter_groups
        (network.py:764,482-496): per-subnet {"lr": mult, "weight_decay":
        mult} applied on top of the optimizer opts."""
        import jax.numpy as jnp
        import optax
        from gandtr_tpu.learning.optimizers import (initialize_optimizer,
                                                    multihead_group_mults)

        rng = np.random.RandomState(5)
        variables = {
            "base": {"params": {"w": np.asarray(rng.randn(3, 3), np.float32),
                                "b": np.asarray(rng.randn(3), np.float32)}},
            "edges": {"params": {"w": np.asarray(rng.randn(2, 3), np.float32)}},
            "depth": {"params": {"w": np.asarray(rng.randn(2, 2), np.float32)}},
        }
        pg = {"edges": {"lr": 0.1, "weight_decay": 0.0},
              "depth": {"lr": 5.0}}
        opt_params = {"algorithm": "adam", "lr": 1e-2, "beta1": 0.9,
                      "beta2": 0.999, "weight_decay": 1e-3}

        # torch: one group per net like _parameters_with_groups builds
        order = ["base", "edges", "depth"]
        tparams = {n: [torch.nn.Parameter(torch.from_numpy(a.copy()))
                       for a in variables[n]["params"].values()]
                   for n in order}
        groups = []
        for n in order:
            g = {"params": tparams[n]}
            for key, val in pg.get(n, {}).items():
                g[key] = opt_params[key] * val
            groups.append(g)
        topt = ref_optim.initialize_base_optimizer(
            groups, {"algorithm": "adam", "lr": 1e-2, "beta1": 0.9,
                     "beta2": 0.999, "weight_decay": 1e-3})

        jp = {n: dict(variables[n]["params"]) for n in order}
        jp = jax.tree_util.tree_map(jnp.asarray, jp) if False else {
            n: {k: jnp.asarray(v) for k, v in variables[n]["params"].items()}
            for n in order}
        mults = multihead_group_mults(pg, variables)
        tx, _ = initialize_optimizer(dict(opt_params), group_mults=mults)
        st = tx.init(jp)

        for step in range(6):
            grads = {n: {k: np.asarray(rng.randn(*np.shape(v)), np.float32)
                         for k, v in variables[n]["params"].items()}
                     for n in order}
            topt.zero_grad()
            for n in order:
                for p, g in zip(tparams[n], grads[n].values()):
                    p.grad = torch.from_numpy(g.copy())
            topt.step()
            jgrads = {n: {k: jnp.asarray(v) for k, v in grads[n].items()}
                      for n in order}
            upd, st = tx.update(jgrads, st, jp)
            import optax as _ox
            jp = _ox.apply_updates(jp, upd)

        for n in order:
            by_key = dict(zip(variables[n]["params"].keys(), tparams[n]))
            for k, ours in jp[n].items():
                np.testing.assert_allclose(np.asarray(ours),
                                           by_key[k].detach().numpy(),
                                           rtol=2e-5, atol=2e-6,
                                           err_msg=f"{n}/{k}")


# ---------------------------------------------------------------------------
# OptimizerAlternation round-robin (optimizer_compositions.py:39-47)
# ---------------------------------------------------------------------------

_COMP = "/root/reference/mdir/components/optim/optimizer/optimizer_compositions.py"


@pytest.fixture(scope="module")
def ref_alternation():
    """Load the reference OptimizerAlternation standalone: its two imports
    feed only the unused classmethod initialize() and __repr__."""
    import types
    src = open(_COMP).read()
    src = src.replace(
        "from .base_optimizers import initialize_base_optimizer",
        "initialize_base_optimizer = None")
    src = src.replace("from ....tools.utils import indent",
                      "indent = lambda s, n: s")
    mod = types.ModuleType("ref_optimizer_compositions")
    exec(compile(src, _COMP, "exec"), mod.__dict__)
    return mod


@needs_reference
class TestAlternationDifferential:
    """Our jitted step-indexed gate (learning/optimizers.alternate_gate)
    reproduces the reference's stateful round-robin trajectory exactly —
    including which member's adam/momentum state advances at each step."""

    @pytest.mark.parametrize("alt_n", [2, 3, 1, -1, -2, -3])
    def test_two_member_rotation(self, ref_alternation, alt_n):
        import jax
        import jax.numpy as jnp
        import optax
        from gandtr_tpu.learning import optimizers as O

        rng = np.random.RandomState(42 + alt_n)
        a0 = rng.randn(3, 2).astype(np.float32)
        b0 = rng.randn(4).astype(np.float32)

        # torch side driven by the reference alternation object
        ta = torch.nn.Parameter(torch.tensor(a0))
        tb = torch.nn.Parameter(torch.tensor(b0))
        alt = ref_alternation.OptimizerAlternation(
            {"a": torch.optim.SGD([ta], lr=0.1, momentum=0.9),
             "b": torch.optim.Adam([tb], lr=0.05)},
            alternate_iteration=alt_n, order="a,b")

        # ours: every member updates every step through its gate
        txa = O.alternate_gate(O.sgd(0.1, momentum=0.9), 0, 2, alt_n)
        txb = O.alternate_gate(O.adam(0.05), 1, 2, alt_n)
        pa, pb = jnp.asarray(a0), jnp.asarray(b0)
        sa, sb = txa.init(pa), txb.init(pb)

        for step in range(9):
            ga = rng.randn(*a0.shape).astype(np.float32)
            gb = rng.randn(*b0.shape).astype(np.float32)
            alt.zero_grad()
            ta.grad = torch.tensor(ga)
            tb.grad = torch.tensor(gb)
            alt.step()

            ua, sa = txa.update(jnp.asarray(ga), sa, pa)
            pa = optax.apply_updates(pa, ua)
            ub, sb = txb.update(jnp.asarray(gb), sb, pb)
            pb = optax.apply_updates(pb, ub)

            np.testing.assert_allclose(np.asarray(pa), ta.detach().numpy(),
                                       atol=5e-6, err_msg="step %d" % step)
            np.testing.assert_allclose(np.asarray(pb), tb.detach().numpy(),
                                       atol=5e-6, err_msg="step %d" % step)

    def test_three_member_all_active_zero(self, ref_alternation):
        """alternate_iteration=0: all members step every iteration."""
        import jax.numpy as jnp
        import optax
        from gandtr_tpu.learning import optimizers as O

        rng = np.random.RandomState(7)
        inits = [rng.randn(2, 2).astype(np.float32) for _ in range(3)]
        tps = [torch.nn.Parameter(torch.tensor(x)) for x in inits]
        alt = ref_alternation.OptimizerAlternation(
            {n: torch.optim.SGD([p], lr=0.2)
             for n, p in zip("abc", tps)},
            alternate_iteration=0, order="a,b,c")
        txs = [O.alternate_gate(O.sgd(0.2), i, 3, 0) for i in range(3)]
        ps = [jnp.asarray(x) for x in inits]
        ss = [tx.init(p) for tx, p in zip(txs, ps)]
        for step in range(4):
            gs = [rng.randn(2, 2).astype(np.float32) for _ in range(3)]
            alt.zero_grad()
            for p, g in zip(tps, gs):
                p.grad = torch.tensor(g)
            alt.step()
            for i in range(3):
                u, ss[i] = txs[i].update(jnp.asarray(gs[i]), ss[i], ps[i])
                ps[i] = optax.apply_updates(ps[i], u)
                np.testing.assert_allclose(np.asarray(ps[i]),
                                           tps[i].detach().numpy(), atol=1e-6)

    def test_frozen_none_member_stays_out(self, ref_alternation):
        """A None-configured optimizer is dropped from the rotation (the
        reference freezes that subnet, initialize():71-75) — the remaining
        members rotate among themselves and the frozen params never move."""
        import jax.numpy as jnp
        import optax
        from gandtr_tpu.learning import optimizers as O

        rng = np.random.RandomState(3)
        a0 = rng.randn(2).astype(np.float32)
        b0 = rng.randn(2).astype(np.float32)
        c0 = rng.randn(2).astype(np.float32)  # frozen
        ta, tb = (torch.nn.Parameter(torch.tensor(x)) for x in (a0, b0))
        alt = ref_alternation.OptimizerAlternation(
            {"a": torch.optim.SGD([ta], lr=0.1),
             "b": torch.optim.SGD([tb], lr=0.1)},
            alternate_iteration=2, order="a,b")
        txa = O.alternate_gate(O.sgd(0.1), 0, 2, 2)
        txb = O.alternate_gate(O.sgd(0.1), 1, 2, 2)
        pa, pb, pc = (jnp.asarray(x) for x in (a0, b0, c0))
        sa, sb = txa.init(pa), txb.init(pb)
        for step in range(6):
            ga, gb = (rng.randn(2).astype(np.float32) for _ in range(2))
            alt.zero_grad()
            ta.grad = torch.tensor(ga)
            tb.grad = torch.tensor(gb)
            alt.step()
            ua, sa = txa.update(jnp.asarray(ga), sa, pa)
            pa = optax.apply_updates(pa, ua)
            ub, sb = txb.update(jnp.asarray(gb), sb, pb)
            pb = optax.apply_updates(pb, ub)
        np.testing.assert_allclose(np.asarray(pa), ta.detach().numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pb), tb.detach().numpy(), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(pc), c0)

    def test_set_learning_rate_through_gate(self):
        """Per-epoch schedules reach the inner injected hyperparams."""
        import jax.numpy as jnp
        from gandtr_tpu.learning import optimizers as O
        tx, base = O.initialize_optimizer({"algorithm": "sgd", "lr": 0.1,
                                           "momentum": 0.9,
                                           "weight_decay": 0.0})
        gated = O.alternate_gate(tx, 0, 2, 2)
        st = gated.init(jnp.zeros((3,)))
        st2 = O.set_learning_rate(st, 0.01)
        assert float(st2.inner.hyperparams["learning_rate"]) == 0.01

    def test_set_epoch_lr_through_gate(self):
        """The training-loop schedule path (training.set_epoch_lr) must also
        unwrap AlternationState — a GAN scenario combining alternate_iteration
        > 1 with an LR scheduler hits this every epoch (round-3 ADVICE)."""
        import jax.numpy as jnp
        from gandtr_tpu.learning import optimizers as O
        from gandtr_tpu.learning.training import set_epoch_lr
        tx, base = O.initialize_optimizer({"algorithm": "adam", "lr": 0.2,
                                           "weight_decay": 0.0})
        gated = O.alternate_gate(tx, 1, 2, 3)
        st = gated.init(jnp.zeros((2, 2)))
        st2 = set_epoch_lr(st, base, 0.5)
        assert float(st2.inner.hyperparams["learning_rate"]) == pytest.approx(
            base * 0.5)
        # rotation phase must survive the LR injection
        assert int(st2.count) == int(st.count)
