"""Build runnable experiments from reference-style scenario config trees.

This is the counterpart of initialize_learning (/root/reference/mdir/learning/
learning.py + training.py): the `network:`/`learning:`/`data:`/`output:`
sections of a train scenario (e.g. iccv23 parameters/train_hedngan.yml) are
resolved into flax models, optax optimizers, a jitted GAN/finetune step, data
loaders, events, checkpoints and a Training loop.
"""
import copy
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.learning.network import build_model_set
from gandtr_tpu.learning.optimizers import (initialize_optimizer,
                                             param_group_mults,
                                             multihead_group_mults)
from gandtr_tpu.learning.schedules import initialize_schedule
from gandtr_tpu.learning.events import initialize_processor
from gandtr_tpu.learning.checkpoints import Checkpoints
from gandtr_tpu.learning.training import Training, VisualValidation
from gandtr_tpu.learning import gan_steps
from gandtr_tpu.learning.image_pool import init_pool
from gandtr_tpu.data.datasets import initialize_dataset_loader
from gandtr_tpu.utils.io import load_torch_checkpoint
from gandtr_tpu.utils import torch_import as ti


EPOCH_ITERATION_FAMILIES = {
    "SupervisedCycleGanEpoch": "cyclegan",
    "SupervisedCUTEpoch": "cut",
    "SupervisedCutEpoch": "cut",
    "SupervisedHEDGANEpoch": "hedgan",
    "SupervisedHedGanEpoch": "hedgan",
    "SupervisedHEDNGANEpoch": "hedngan",
    "SupervisedHedNGanEpoch": "hedngan",
}


#: loss-function names each family's jitted step implements (reference-exact
#: mse adversarial / l1 reconstruction — every published config). A config
#: asking for a different base loss must FAIL, not silently train with the
#: hardcoded one (same policy as the alternate_iteration guard below).
_FAMILY_LOSSES = {
    "cyclegan": {"cycle_loss", "multihead_loss", "discriminator_loss",
                 "mse", "l1"},
    "cut": {"multihead_loss", "discriminator_loss",
            "multilayer_patchnce_loss", "mse", "l1"},
    "hedgan": {"multihead_loss", "discriminator_loss", "mse", "l1"},
    "hedngan": {"multihead_loss", "discriminator_loss", "mse", "l1"},
}


def _check_criterion_losses(crit, family):
    """Walk the criterion subtree and refuse `loss:` values outside the
    family's implemented set (the steps hardcode the reference's published
    mse/l1 semantics; cf. criterion/__init__.py CRITERIA registry)."""
    allowed = _FAMILY_LOSSES[family]

    def walk(node):
        if not isinstance(node, dict):
            return
        for key, value in node.items():
            if key == "loss" and isinstance(value, str) and value not in allowed:
                raise NotImplementedError(
                    "criterion loss %r is not implemented by the %s step "
                    "(supported: %s)" % (value, family, sorted(allowed)))
            walk(value)

    walk(crit)


def _parse_device_scalecrop(tstr, mean_std):
    """Accept exactly `pil2np | scalecrop:SIZE[:SCALE] | totensor |
    normalize` (the GAN train protocol chain) and return the pieces of the
    device-scalecrop staging; None for any other chain."""
    parts = [p.strip() for p in str(tstr or "").split("|")]
    if len(parts) != 4 or parts[0] != "pil2np" or parts[2] != "totensor" \
            or parts[3] != "normalize":
        return None
    bits = parts[1].split(":")
    if bits[0] != "scalecrop" or len(bits) < 2:
        return None
    from gandtr_tpu.data.transforms import RandomScaleCrop
    sc = RandomScaleCrop(*bits[1:])
    size = sc.params["size"]  # (w, h)
    return {"sc": sc, "pad": sc.max_crop_side,
            "out_hw": (int(size[1]), int(size[0])),
            "mean": np.asarray(mean_std[0], np.float32),
            "std": np.asarray(mean_std[1], np.float32)}


def _maybe_data_parallel(step, state, par_cfg, batch_size, num_batch_args):
    """Shard the step's batch args over a 'data' mesh when parallel config +
    device count + batch divisibility allow; otherwise jit single-device."""
    if par_cfg in (False, None):
        return jax.jit(step), state
    from gandtr_tpu.parallel import mesh as M
    n_req = int(par_cfg.get("devices", 0)) if isinstance(par_cfg, dict) else 0
    n_dev = min(n_req, len(jax.devices())) if n_req else len(jax.devices())
    if n_dev <= 1:
        return jax.jit(step), state
    if batch_size and batch_size % n_dev:
        warnings.warn("data-parallel disabled: batch %d not divisible by %d "
                      "devices" % (batch_size, n_dev))
        return jax.jit(step), state
    mesh = M.make_mesh(n_dev)
    state = M.replicate_tree(mesh, state)
    return M.data_parallel_step(step, mesh,
                                num_batch_args=num_batch_args), state


def _load_pretrained_into(variables, model_cfg, name):
    """Load a `pretrained:` URL/path from a model config into variables
    (e.g. the HED detector checkpoint, train_hedngan.yml:25-27)."""
    url = model_cfg.get("pretrained")
    if not url or url is True:
        return variables
    try:
        state = load_torch_checkpoint(url)
    except Exception as exc:  # zero-egress envs: keep random init
        warnings.warn("Could not fetch pretrained '%s' for %s: %s"
                      % (url, name, exc))
        return variables
    # the checkpoint IS present: an incomplete import must fail loudly here,
    # not degrade to random weights behind a warning
    from gandtr_tpu.utils.io import normalize_network_checkpoint
    state = normalize_network_checkpoint(state)["net"]["model_state"]
    key_map = ti.key_map_for_architecture(model_cfg.get("architecture", ""))
    return ti.convert_torch_state(variables, state, key_map=key_map,
                                  strict=False, min_coverage=1.0)


def _adopt_path_members(net_cfg):
    """Rewrite path-form NetworkSet members in place; return staged torch
    model_states keyed by member name (reference network.py:165-186)."""
    from gandtr_tpu.utils.io import (normalize_network_checkpoint,
                                     resolve_path)
    path_states = {}
    for name, sub in list(net_cfg.items()):
        if not isinstance(sub, dict) or not sub.get("path"):
            continue
        p = str(sub["path"])
        if not p.endswith((".pth", ".pt")):
            continue
        ck = normalize_network_checkpoint(
            load_torch_checkpoint(resolve_path(p)))["net"]
        ckp = dict(ck.get("network_params") or {})
        sub = dict(sub)
        sub.pop("path")
        runtime = sub.get("runtime", "load_from_checkpoint")
        if runtime == "load_from_checkpoint":
            runtime = copy.deepcopy(dict(ckp.get("runtime") or {}))
        else:
            ck_rt = dict(ckp.get("runtime") or {})
            runtime = {k: (copy.deepcopy(ck_rt.get(k))
                           if v == "load_from_checkpoint" else v)
                       for k, v in dict(runtime).items()}
        if "model" in sub:
            assert sub["model"] == ckp.get("model"), \
                "%r != %r" % (sub["model"], ckp.get("model"))
        sub["model"] = copy.deepcopy(dict(ckp["model"]))
        sub["runtime"] = runtime
        sub.pop("initialize", None)  # weights come from the checkpoint
        path_states[name] = ck["model_state"]
        net_cfg[name] = sub
    return path_states


def build_gan_experiment(scenario, sample_hw=256, batch_size=None,
                         directory=None, data_override=None):
    """Returns dict with models, step (jitted), state, training, loaders.

    `scenario` is the resolved config tree with `network`, `learning`, `data`,
    `output` sections.
    """
    scenario = copy.deepcopy(scenario)
    net_cfg = scenario["network"]
    learn_cfg = scenario["learning"]
    train_cfg = dict(learn_cfg["training"])
    data_cfg = data_override or scenario.get("data", {})
    # resume safety (reference learning.py:46-50 + 63-70): the checkpointed
    # validation/dataset config must equal the current one — snapshot the
    # EFFECTIVE data config (data_override included) before builders mutate
    config_snapshot = copy.deepcopy({
        "validation": learn_cfg.get("validation"),
        "datasets": data_cfg})

    # reference path-form NetworkSet members ({type: SingleNetwork,
    # path: ckpt.pth}) — rebuild the model config from the checkpoint's own
    # network_params and stage the weights for post-init import (reference
    # network.py:165-186 incl. the runtime "load_from_checkpoint" forms and
    # the model-equality assert); lets GAN training warm-start from
    # checkpoints exactly like the reference engine
    path_states = _adopt_path_members(net_cfg)

    models, init_specs = build_model_set(net_cfg)

    # epoch iteration family
    it_cfg = dict(train_cfg.get("epoch_iteration", {}))
    family = EPOCH_ITERATION_FAMILIES[it_cfg.get("type", "SupervisedHEDNGANEpoch")]

    # criterion weights
    crit = dict(train_cfg.get("criterion", {}))
    weights = dict(crit.get("weights", {}))
    _check_criterion_losses(crit, family)

    # sample inputs + init
    rng = jax.random.PRNGKey(int(train_cfg.get("seed", 0)))
    x0 = jnp.zeros((2, sample_hw, sample_hw, 3), jnp.float32)
    sample_inputs = {}
    for name, net in models.nets.items():
        if net.module.__class__.__name__ == "PatchSampleF":
            continue  # initialized below from generator taps
        sample_inputs[name] = x0
    variables = models.init_all(rng, sample_inputs, init_specs,
                                lazy=("featdown",))

    # PatchSampleF (CUT): init from generator feature taps
    nce_layers = None
    if family == "cut":
        nce = crit.get("nce", {})
        nce_layers = tuple(int(x) for x in str(nce.get("nce_layers", "4,8,12,16")).split(","))
        feats = models["generator_X"].apply(
            variables["generator_X"], x0, train=False,
            layers=nce_layers, encode_only=True)
        variables["featdown"] = dict(models["featdown"].module.init(
            rng, feats, num_patches=int(nce.get("num_patches", 256)), rng=rng))
        spec = (init_specs or {}).get("featdown")
        if spec:
            # the reference applies the initialize spec over the eagerly
            # created MLPs too (network.py:163 model.apply over the whole
            # PatchSampleF; its create_mlp runs in __init__ when
            # input_nc+nce_layers are configured, p2p_networks.py:620-627)
            from gandtr_tpu.models.init import initialize_weights
            variables["featdown"]["params"] = initialize_weights(
                variables["featdown"]["params"], rng, **dict(spec))

    # pretrained subnet weights (e.g. HED teacher/student)
    for name, sub in net_cfg.items():
        if isinstance(sub, dict) and "model" in sub and name in variables:
            variables[name] = _load_pretrained_into(variables[name],
                                                    sub["model"], name)
    # checkpoint weights for path-form members (after init, before aliasing)
    for name, state in path_states.items():
        arch = (net_cfg[name].get("model") or {}).get("architecture", "")
        variables[name] = ti.convert_torch_state(
            variables[name], state,
            key_map=ti.key_map_for_architecture(arch),
            strict=False, min_coverage=1.0)
    if "detector_frozen" in variables and "detector" in variables:
        variables["detector_frozen"] = jax.tree_util.tree_map(
            lambda x: x, variables["detector"])

    # optimizers + schedules
    opt_cfg = dict(train_cfg.get("optimizer", {}))
    # The reference's OptimizerAlternation round-robin step()
    # (optimizer_compositions.py:39-47) is bypassed by its GAN epochs, which
    # index optimizers directly and step D/G in-step every batch
    # (gan_epochs.py:88-107) — every shipped iccv23 config uses 1 (in-step
    # alternation, golden-parity). alternate_iteration > 1 wires the actual
    # round-robin as a step-indexed gate around each member optimizer
    # (learning/optimizers.alternate_gate, differential-tested vs the
    # reference class in tests/test_optim_differential.py).
    composition = dict(opt_cfg.pop("composition", None) or {})
    alt = composition.get("alternate_iteration", 1)
    optimizers, base_lr = {}, {}
    for name, cfg in opt_cfg.items():
        if cfg is None:
            continue
        # reference parameter groups: a trained HED detector gets per-layer
        # lr/decay multipliers (network.py:66-72 -> hed.py:86-112); a
        # MultiheadNetwork carries config-level per-subnet groups
        # (network.py:764,844)
        net_entry = net_cfg.get(name) or {}
        arch = ((net_entry.get("model") or {})).get("architecture")
        net_obj = models.nets.get(name)
        pg = getattr(net_obj, "parameter_groups", None)
        if name in variables and pg:
            mults = multihead_group_mults(pg, variables[name])
        elif name in variables and arch and "params" in variables[name]:
            mults = param_group_mults(arch, variables[name]["params"])
        else:
            mults = None
        optimizers[name], base_lr[name] = initialize_optimizer(dict(cfg),
                                                               group_mults=mults)

    if alt not in (None, 0, 1):
        # reference OptimizerAlternation: `order` names the rotation; None
        # optimizers were dropped above (frozen subnets, initialize():71-75)
        from gandtr_tpu.learning.optimizers import alternate_gate
        order = [s.strip() for s in str(composition["order"]).split(",")]
        assert set(order) == set(optimizers), (order, list(optimizers))
        for i, name in enumerate(order):
            optimizers[name] = alternate_gate(optimizers[name], i,
                                              len(order), int(alt))

    epochs = int(train_cfg.get("epochs", 1))
    sched_cfg = dict(train_cfg.get("scheduler", {}))
    sched_cfg.pop("composition", None)
    schedules = {name: initialize_schedule(epochs, dict(cfg))
                 for name, cfg in sched_cfg.items() if cfg is not None}

    # pools (cyclegan)
    pools = {}
    if family == "cyclegan":
        pool_size = int(it_cfg.get("pool_size", 50))
        pools = {"fake_X_pool": init_pool(pool_size, (sample_hw, sample_hw, 3)),
                 "fake_Y_pool": init_pool(pool_size, (sample_hw, sample_hw, 3))}

    state = gan_steps.make_gan_state(variables, optimizers, pools,
                                     seed=int(train_cfg.get("seed", 0)))

    # step builder
    if family == "cyclegan":
        wx = dict(crit.get("loss_G_X", {}).get("weights", {}))
        wy = dict(crit.get("loss_G_Y", {}).get("weights", {}))
        step = gan_steps.build_cyclegan_step(models.nets, optimizers, wx, wy)
    elif family == "cut":
        nce = crit.get("nce", {})
        step = gan_steps.build_cut_step(
            models.nets, optimizers, weights, nce_layers=nce_layers,
            num_patches=int(nce.get("num_patches", 256)),
            temperature=float(nce.get("temperature", 0.07)),
            nce_weight=float(nce.get("weight", 1.0)),
            batch_dim_for_bmm=int(nce.get("batch_dim_for_bmm", 1)))
    elif family == "hedgan":
        step = gan_steps.build_hedgan_step(models.nets, optimizers, weights)
    else:
        # opt-in knobs (default off = reference-exact; see the builder's
        # docstring and docs/PERF.md round-4 for why neither is the default)
        concat = bool(it_cfg.get("concat_student", False))
        cache_cfg = it_cfg.get("cache_teacher_targets", False)
        step = gan_steps.build_hedngan_step(
            models.nets, optimizers, weights, concat_student=concat,
            emit_targets=bool(cache_cfg))
        if cache_cfg:
            ext_step = gan_steps.build_hedngan_step(
                models.nets, optimizers, weights, concat_student=concat,
                external_targets=True)

    # data parallelism is the first-class default (SURVEY §2.11): when more
    # than one device is visible and the batch divides, the step shards the
    # batch over a 1-D 'data' mesh with replicated state (XLA inserts the
    # gradient psum). `learning.training.parallel: false` disables;
    # `parallel: {devices: N}` restricts the mesh.
    par_cfg = train_cfg.get("parallel", True)
    # the divisibility check must see the batch the loader will actually use:
    # an explicit batch_size argument overrides the config's loader value below
    batch_size_cfg = int(batch_size
                         or (data_cfg.get("train") or {}).get("loader", {})
                         .get("batch_size", 0) or 0)

    # OPT-IN device-side scalecrop (`data.train.device_scalecrop: true`):
    # the host ships padded uint8 CROPS (same pixels, same RNG draws) and
    # the /255 + bilinear resize + normalize run in-graph — the train
    # chain's f32 upload shrinks ~2.6x (round-5: the tunnel's 25-45 MB/s
    # link floors the chunked step at ~350 ms). NOT default: the in-graph
    # resize is ~1e-7 rel off cv2's float evaluation order, and the
    # default path stays reference-identical (docs/PERF.md round-5).
    dsc = None
    if (data_cfg.get("train") or {}).get("device_scalecrop", False):
        _gd = models["generator_X"].data_params or {}
        _tstr = data_cfg["train"].get("transforms", _gd.get("transforms"))
        _ms = data_cfg["train"].get("mean_std",
                                    _gd.get("mean_std", [[0.5] * 3] * 2))
        dsc = _parse_device_scalecrop(_tstr, _ms)
        if dsc is None:
            warnings.warn("device_scalecrop disabled: transform chain %r is "
                          "not 'pil2np | scalecrop | totensor | normalize'"
                          % _tstr)
    if dsc is not None:
        from gandtr_tpu.ops.resize import dynamic_bilinear_resize_u8
        _inner = step
        _mean = jnp.asarray(dsc["mean"])
        _std = jnp.asarray(dsc["std"])
        _oh, _ow = dsc["out_hw"]

        def step(state, xu8, xhw, yu8, yhw):
            X = (dynamic_bilinear_resize_u8(xu8, xhw, _oh, _ow)
                 - _mean) / _std
            Y = (dynamic_bilinear_resize_u8(yu8, yhw, _oh, _ow)
                 - _mean) / _std
            return _inner(state, X, Y)

    step, state = _maybe_data_parallel(step, state, par_cfg, batch_size_cfg,
                                       num_batch_args=(4 if dsc else 2))
    if dsc is not None:
        batch_to_args = lambda b: tuple(jnp.asarray(b[i])  # noqa: E731
                                        for i in range(4))
    else:
        batch_to_args = lambda b: (jnp.asarray(b[0]), jnp.asarray(b[1]))  # noqa: E731
    if dsc is not None and it_cfg.get("cache_teacher_targets", False):
        raise NotImplementedError(
            "device_scalecrop is incompatible with cache_teacher_targets "
            "(the cache keys/converts 2-arg float batches)")
    if family == "hedngan" and it_cfg.get("cache_teacher_targets", False):
        from gandtr_tpu.learning.teacher_cache import TeacherTargetCachingStep
        cache_cfg = it_cfg["cache_teacher_targets"]
        ext_step, _ = _maybe_data_parallel(ext_step, state, par_cfg,
                                           batch_size_cfg, num_batch_args=3)
        step = TeacherTargetCachingStep(
            step, ext_step,
            max_items=(cache_cfg.get("max_items", 64)
                       if isinstance(cache_cfg, dict) else 64))
        batch_to_args = step.batch_to_args

    # data loader
    loader = None
    if data_cfg.get("train"):
        dp = copy.deepcopy(data_cfg["train"])
        gen_data = models["generator_X"].data_params
        dp.setdefault("transforms", gen_data.get("transforms"))
        dp.setdefault("mean_std", gen_data.get("mean_std"))
        if batch_size:
            dp.setdefault("loader", {})["batch_size"] = batch_size
        dp.pop("device_scalecrop", None)
        loader = initialize_dataset_loader([], "train", dp, {"shuffle": True})
        if dsc is not None:
            # swap the host chain for the uint8-crop half; the device half
            # (in-graph resize+normalize) is inside `step` above
            from gandtr_tpu.data.transforms import DeviceScalecrop
            loader.dataset.transform = DeviceScalecrop(dsc["sc"])

    # events / checkpoints. The GAN configs' MultiCriterialValidation names
    # "epoch" as the decisive criterion (_gan_eval.yml:2): every epoch is
    # best, so _best tracks _last. A config naming a metric key instead gets
    # the reference's dtype-directed argmin/argmax (events.MetadataKeeper).
    out_cfg = (scenario.get("output") or {}).get("learning", {})
    _vcfg = learn_cfg.get("validation") or {}
    events = initialize_processor(
        out_cfg, directory=directory,
        decisive_criterion=_vcfg.get("decisive_criterion")
        if isinstance(_vcfg, dict) else None)
    ckpt_cfg = dict(learn_cfg.get("checkpoints", {}))
    checkpoints = None
    if directory:
        checkpoints = Checkpoints(
            directory,
            store_every=ckpt_cfg.get("store_every", 10) or 0,
            checkpoint_every=ckpt_cfg.get("checkpoint_every", 2) or 0,
            directory_epoch_regex=ckpt_cfg.get("directory_epoch_regex"))

    frozen = tuple(name for name, net in models.nets.items() if net.frozen)

    # validations: visual (generator over fixed val images, _gan_eval.yml)
    validations = []
    val_cfg = learn_cfg.get("validation") or {}
    vis_cfg = val_cfg.get("visual") if isinstance(val_cfg, dict) else None
    if vis_cfg:
        crit = (vis_cfg.get("criterion") or {})
        vdata = (crit.get("data") or {})
        vds = (vdata.get("dataset") or {})
        image_dir = vds.get("image_dir")
        try:
            from gandtr_tpu.utils.io import resolve_path as _rp
            from gandtr_tpu.data.datasets import imread as _imread
            from gandtr_tpu.data.transforms import initialize_transforms as _it
            import os as _os
            vdir = _rp(image_dir)
            names = sorted(_os.listdir(vdir))[:4] if vdir and _os.path.isdir(vdir) else []
            if names:
                tfm = _it(vdata.get("transforms", "pil2np | totensor | normalize"),
                          vdata.get("mean_std", [[0.5] * 3, [0.5] * 3]))
                arrs = [jnp.asarray(tfm(_imread(_os.path.join(vdir, n))))
                        for n in names]
                # aspect-preserving transforms (downscale:362) yield mixed
                # shapes — keep a list then; VisualValidation forwards
                # per-image like the reference's batch_size=1 loader
                imgs = (jnp.stack(arrs)
                        if len({a.shape for a in arrs}) == 1 else arrs)
                validations.append(VisualValidation(
                    models["generator_X"].module, imgs,
                    mean_std=vdata.get("mean_std", [[0.5] * 3, [0.5] * 3]),
                    frequency=vis_cfg.get("frequency", 1), names=names))
        except Exception as exc:
            warnings.warn("visual validation disabled: %s" % exc)

    # `learning.training.dispatch_chunk: K` (opt-in) scans K identical steps
    # inside ONE jit dispatch with a single host-stacked upload — exactly the
    # per-step math/order (learning/training.build_chunk_fn), it only changes
    # the host<->device cadence. Through the tunnel each plain dispatch pays
    # ~1 s RTT (CLAUDE.md IO rules), so this is the train-chain analog of
    # round-2's eval uint8 staging. Incompatible with the teacher cache's
    # per-batch host-side dispatch decision.
    chunk = int(train_cfg.get("dispatch_chunk", 0) or 0)
    chunk_to_args = None
    if chunk > 1 and getattr(step, "gandtr_dp", False):
        # the dp wrapper device_puts batch args by LEADING dim — a stacked
        # (K, B, ...) chunk would shard the chunk axis; chunking targets the
        # single-chip tunnel dispatch RTT, dp targets throughput — pick dp
        warnings.warn("dispatch_chunk disabled: data-parallel step active")
        chunk = 0
    if chunk > 1 and not it_cfg.get("cache_teacher_targets", False):
        _nargs = 4 if dsc is not None else 2
        chunk_to_args = lambda batches: tuple(  # noqa: E731
            jnp.asarray(np.stack([np.asarray(b[i]) for b in batches]))
            for i in range(_nargs))
        if loader is not None and hasattr(loader, "prefetch"):
            # the chunked loop drains `chunk` batches per dispatch — keep
            # the decode threads busy through the device window
            loader.prefetch = max(loader.prefetch, chunk + 2)
    else:
        chunk = 0

    training = None
    if loader is not None:
        training = Training(
            step_fn=step, loader=loader, epochs=epochs,
            seed=int(train_cfg.get("seed", 0)),
            optimizers_base_lr=base_lr, schedules=schedules, events=events,
            checkpoints=checkpoints, frozen=frozen, validations=validations,
            batch_to_args=batch_to_args,
            profile_dir=out_cfg.get("profile"),
            mean_std=(data_cfg.get("train") or {}).get(
                "mean_std", models["generator_X"].data_params.get("mean_std")),
            config_snapshot=config_snapshot, chunk=chunk,
            chunk_to_args=chunk_to_args)

    return {"models": models, "variables": variables, "optimizers": optimizers,
            "state": state, "step": step, "training": training,
            "loader": loader, "events": events, "checkpoints": checkpoints,
            "schedules": schedules, "base_lr": base_lr, "family": family}
