"""Build the GeM fine-tune experiment (CirSequentialNetwork scenarios,
parameters/finetune.yml): augment (frozen generator + meanstd/clahe/ratio
wrappers) → embed (GeM net), mined tuples, contrastive loss.

TPU-first data layout: tuple images resize to `image_size` longest side, pad
to a static square with validity masks (masked GeM — SURVEY.md §5.7), and the
md5-name augmentation gates arrive as a per-image boolean mask
(wrappers.cir_hash_passthrough; reference wrapper.py:137-143).
"""
import copy
import os
import pickle
import warnings

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.data.datasets import Loader, imread
from gandtr_tpu.data.cir_datasets import TupleEpochDataset, generator_safe_bucket
from gandtr_tpu.data.mining import TuplesMiner, cid2filename
from gandtr_tpu.data.transforms import initialize_transforms
from gandtr_tpu.eval.retrieval import imresize
from gandtr_tpu.learning.criteria import initialize_criterion
from gandtr_tpu.learning.network import build_single_net
from gandtr_tpu.learning.optimizers import (initialize_optimizer,
                                             param_group_mults)
from gandtr_tpu.learning.schedules import initialize_schedule
from gandtr_tpu.learning.events import initialize_processor
from gandtr_tpu.learning.checkpoints import Checkpoints
from gandtr_tpu.learning.training import Training
from gandtr_tpu.learning import supervised
from gandtr_tpu.learning.wrappers import cir_hash_passthrough, metadata_name
from gandtr_tpu.utils.io import resolve_path


def load_tuples_db(dataset_pkl, split, ims_root):
    """Load a retrieval-SfM-style training pkl: {split: {cids|ids, cluster,
    qidxs, pidxs}} (traindataset.py:100-148)."""
    with open(resolve_path(dataset_pkl), "rb") as f:
        db_full = pickle.load(f)
    db = db_full[split]
    if "cids" in db:
        images = [cid2filename(cid, resolve_path(ims_root)) for cid in db["cids"]]
    else:
        images = [os.path.join(resolve_path(ims_root), x) for x in db["ids"]]
    return db, images


def build_finetune_experiment(params, directory=None, db=None, images=None):
    """params: the resolved finetune scenario tree (network/learning/data)."""
    params = copy.deepcopy(params)
    net_cfg = params["network"]
    learn_cfg = params["learning"]
    train_cfg = dict(learn_cfg["training"])
    data_cfg = params.get("data", {})
    # resume safety snapshot (reference learning.py:46-50 + 63-70)
    config_snapshot = copy.deepcopy({
        "validation": learn_cfg.get("validation"),
        "datasets": params.get("data")})

    # --- networks: augment (frozen generator) + embed (GeM) ---
    seq = [x.strip() for x in net_cfg.get("sequence", "augment,embed").split(",")]
    assert seq == ["augment", "embed"], seq

    augment_cfg = dict(net_cfg["augment"])
    augment_path = augment_cfg.pop("path", None)
    if augment_path and "model" not in augment_cfg and \
            str(augment_path).endswith((".pth", ".pt")) and \
            os.path.exists(resolve_path(str(augment_path))):
        # reference path-form subnet (network.py:163-185): model params from
        # the checkpoint; runtime 'load_from_checkpoint' adopts its runtime
        from gandtr_tpu.utils.io import (load_torch_checkpoint,
                                         normalize_network_checkpoint)
        _ck = normalize_network_checkpoint(
            load_torch_checkpoint(resolve_path(str(augment_path))))["net"]
        _ck_params = dict(_ck.get("network_params") or {})
        augment_cfg["model"] = dict(_ck_params.get("model") or {})
        rt = augment_cfg.get("runtime")
        if rt == "load_from_checkpoint":
            augment_cfg["runtime"] = dict(_ck_params.get("runtime") or {})
        elif isinstance(rt, dict):
            augment_cfg["runtime"] = {
                k: (dict(_ck_params.get("runtime") or {}).get(k)
                    if v == "load_from_checkpoint" else v)
                for k, v in rt.items()}
    augment_cfg.setdefault("model", {"architecture": "official_resnet_generator",
                                     "no_antialias": True, "no_antialias_up": True,
                                     "input_nc": 3, "output_nc": 3, "n_blocks": 9,
                                     "norm_layer": "instance"})
    augment = build_single_net(augment_cfg)

    embed_cfg = dict(net_cfg["embed"])
    embed_path = embed_cfg.pop("path", None)
    if embed_path and "model" not in embed_cfg:
        # reference path-form subnet (network.py:163-185): model params come
        # from the checkpoint; runtime from the config (or checkpoint when
        # 'load_from_checkpoint')
        from gandtr_tpu.utils.io import (load_torch_checkpoint,
                                         normalize_network_checkpoint)
        _ck = normalize_network_checkpoint(
            load_torch_checkpoint(resolve_path(embed_path)))["net"]
        embed_cfg["model"] = dict(
            (_ck.get("network_params") or {}).get("model") or {})
    embed = build_single_net(embed_cfg)

    models = {"augment": augment, "embed": embed}

    rng = jax.random.PRNGKey(int(train_cfg.get("seed", 0)))
    image_size = int(data_cfg.get("train", {}).get("dataset", {})
                     .get("image_size", 362))
    bucket = generator_safe_bucket(image_size)
    x0 = jnp.zeros((2, bucket, bucket, 3), jnp.float32)
    variables = {
        "augment": dict(augment.init(rng, x0, train=False)),
        "embed": dict(embed.init(rng, x0)),
    }
    if embed_path:
        from gandtr_tpu.utils.io import (load_torch_checkpoint,
                                         normalize_network_checkpoint)
        from gandtr_tpu.utils import torch_import as ti
        _st = normalize_network_checkpoint(
            load_torch_checkpoint(resolve_path(embed_path)))["net"]
        variables["embed"] = ti.convert_torch_state(
            variables["embed"], _st["model_state"],
            key_map=ti.key_map_for_architecture(
                embed_cfg.get("model", {}).get("architecture", "")),
            strict=False, min_coverage=1.0)
    if augment_path:
        try:
            if str(augment_path).endswith(".pth"):
                # reference-published torch generator checkpoint (URL or file),
                # e.g. hedngan_generator_X.pth in train/hedngan.yml's finetune
                from gandtr_tpu.utils.io import load_torch_checkpoint
                from gandtr_tpu.utils import torch_import as ti
                from gandtr_tpu.utils.io import normalize_network_checkpoint
                state = load_torch_checkpoint(augment_path)
                state = normalize_network_checkpoint(state)["net"]["model_state"]
                variables["augment"] = ti.convert_torch_state(
                    variables["augment"], state, strict=False)
            else:
                from gandtr_tpu.learning.checkpoints import load_network_file
                variables["augment"] = load_network_file(
                    resolve_path(augment_path), variables["augment"])
        except Exception as exc:
            warnings.warn("augment checkpoint '%s' not loaded: %s"
                          % (augment_path, exc))

    # --- optimizer / schedule / criterion ---
    # reference parameter groups for the trained embed net: GeM pool p at
    # lr x10 / weight_decay 0 etc. (network.py:66-72 -> cirnet.py:11-33)
    embed_mults = param_group_mults(
        embed_cfg.get("model", {}).get("architecture", ""),
        variables["embed"]["params"])
    optimizer, base_lr = initialize_optimizer(dict(train_cfg["optimizer"]),
                                              group_mults=embed_mults)
    epochs = int(train_cfg.get("epochs", 1))
    schedule = initialize_schedule(epochs, dict(train_cfg.get(
        "scheduler", {"algorithm": "const"})))
    crit = dict(train_cfg.get("criterion", {"loss": "contrastive", "margin": 0.75}))
    margin = float(crit.get("margin", 0.75))
    criterion = initialize_criterion(crit)
    it_cfg = dict(train_cfg.get("epoch_iteration", {}))
    fakebatch = bool(it_cfg.get("fakebatch", True))

    state = supervised.make_finetune_state(variables, optimizer,
                                           seed=int(train_cfg.get("seed", 0)))
    # the generator only ever runs on positions the ratio gate can select:
    # tuple layout is [anc, pos, neg*] (cir_datasets.py), so a 'anc' gate
    # restricts the generator to position 0 (1/S of its FLOPs, same result)
    import re as _re
    _, gate_label = _parse_ratio(augment_cfg.get("runtime", {}).get("wrappers", ""))
    ds_train_cfg = data_cfg.get("train", {}).get("dataset", {})
    neg_num = int(ds_train_cfg.get("neg_num", 5))
    # layout must track the first_neg override (cir_datasets.__getitem__):
    # "pos" relabels the top-ranked negative, "exc" drops it from the tuple
    first_neg = ds_train_cfg.get("first_neg", "neg")
    if first_neg == "exc":
        layout = ["anc", "pos"] + ["neg"] * max(neg_num - 1, 0)
    else:
        layout = ["anc", "pos"] + ([first_neg] + ["neg"] * (neg_num - 1)
                                   if neg_num else [])
    # mark_easy suffixes labels with -easy/-hard: the static restriction must
    # then be permissive (both variants still match prefix gates like "anc")
    positions = tuple(i for i, l in enumerate(layout)
                      if _re.match(gate_label, l))
    augment_positions = positions if 0 < len(positions) < len(layout) else None
    raw_step = supervised.build_finetune_step(
        models, optimizer, margin=margin, fakebatch=fakebatch,
        criterion=criterion, augment_positions=augment_positions)

    # EXACT uint8 staging for the tuple batches (round-5 rehearsal: f32
    # images + all-ones float masks were 74 MB/step through the tunnel,
    # 24x off the in-graph bound). imresize yields uint8 PIL; the tuple
    # transform is elementwise after it, so /255 + normalize move in-graph
    # bit-identically, masks rebuild from per-image (h, w), and the pad
    # band re-zeroes by mask multiply exactly like the host _pad.
    # `data.train.device_preprocess: false` restores the host pipeline.
    from gandtr_tpu.data.transforms import split_device_transform
    _gen_data_probe = augment.data_params if augment.data_params and \
        augment.data_params != "load_from_checkpoint" else {
            "transforms": "pil2np | totensor | normalize",
            "mean_std": [[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]]}
    _dev_host, _dev_fn = split_device_transform(
        _gen_data_probe.get("transforms", ""),
        _gen_data_probe.get("mean_std", [[0.5] * 3, [0.5] * 3]))
    device_stage = (_dev_fn is not None and
                    bool(data_cfg.get("train", {}).get("device_preprocess",
                                                       True)))
    if device_stage:
        _float_step = raw_step

        def raw_step(state, imgs_u8, hws, labels, pmask):
            T_, S_, H_, W_ = imgs_u8.shape[:4]
            rows = jnp.arange(H_)[None, None, :, None]
            cols = jnp.arange(W_)[None, None, None, :]
            masks = ((rows < hws[:, :, 0, None, None]) &
                     (cols < hws[:, :, 1, None, None])).astype(jnp.float32)
            x = imgs_u8.astype(jnp.float32) / 255.0
            flat = x.reshape((T_ * S_, H_, W_) + x.shape[4:])
            y = _dev_fn(flat, mask=masks.reshape(T_ * S_, H_, W_))
            y = y.reshape((T_, S_, H_, W_) + y.shape[3:])
            y = y * masks[..., None]  # pad band back to exact 0 (host _pad)
            return _float_step(state, y, masks, labels, pmask)

    from gandtr_tpu.scenarios.build import _maybe_data_parallel
    step, state = _maybe_data_parallel(
        raw_step, state, train_cfg.get("parallel", True),
        int(data_cfg.get("train", {}).get("loader", {}).get("batch_size", 5)
            or 5), num_batch_args=4)

    # --- mining + dataset ---
    ds_cfg = dict(data_cfg.get("train", {}).get("dataset", {}))
    loader_cfg = dict(data_cfg.get("train", {}).get("loader", {}))
    if db is None and ds_cfg.get("dataset_pkl"):
        db, images = load_tuples_db(ds_cfg["dataset_pkl"],
                                    ds_cfg.get("split", "train"),
                                    ds_cfg.get("image_dir", ""))
    loader = None
    dataset = None
    if db is not None:
        miner = TuplesMiner(
            db, nnum=int(ds_cfg.get("neg_num", 5)),
            qsize=int(float(ds_cfg.get("query_size", 2000))),
            poolsize=int(float(ds_cfg.get("pool_size", 22000))),
            seed=int(train_cfg.get("seed", 0)),
            qpool_size=(int(float(ds_cfg["qpool_size"]))
                        if "qpool_size" in ds_cfg else None),
            similar_exclude=ds_cfg.get("similar_exclude"),
            similar_include=ds_cfg.get("similar_include"),
            mark_easy=ds_cfg.get("mark_easy"),
            first_neg=ds_cfg.get("first_neg", "neg"))
        # dataset transform: generator-side normalization (augment data params)
        gen_data = augment.data_params if augment.data_params and \
            augment.data_params != "load_from_checkpoint" else {
                "transforms": "pil2np | totensor | normalize",
                "mean_std": [[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]]}
        transform = initialize_transforms(gen_data["transforms"],
                                          gen_data["mean_std"])
        # augmentation gate from the wrapper spec
        ratio, label = _parse_ratio(augment_cfg.get("runtime", {})
                                    .get("wrappers", ""))
        dataset = TupleEpochDataset(db, images, transform, image_size, miner,
                                    augment_ratio=ratio, augment_label=label,
                                    neg_num=int(ds_cfg.get("neg_num", 5)),
                                    device_preprocess=device_stage)
        dataset.extract_fn = _make_extract_fn(models, state, images, transform,
                                              image_size, augment_ratio=ratio,
                                              augment_label=label,
                                              device_fn=(_dev_fn if device_stage
                                                         else None))
        loader = Loader(dataset, batch_size=int(loader_cfg.get("batch_size", 5)),
                        shuffle=True, drop_last=True,
                        num_workers=int(loader_cfg.get("num_workers", 6)))

    out_cfg = (params.get("output") or {}).get("learning", {})
    ckpt_cfg = dict(learn_cfg.get("checkpoints") or {})
    checkpoints = Checkpoints(
        directory,
        store_every=ckpt_cfg.get("store_every", 10) or 0,
        checkpoint_every=ckpt_cfg.get("checkpoint_every", 2) or 0,
        directory_epoch_regex=ckpt_cfg.get("directory_epoch_regex")) \
        if directory else None

    # val-tuple loss validation (finetune.yml validation: SingleValidation,
    # frequency 5, over the CirTuples val split)
    validations = []
    val_section = dict(learn_cfg.get("validation") or {})
    val_data = dict(data_cfg.get("val") or {})
    if val_section and val_data and db is not None:
        vds_cfg = dict(val_data.get("dataset", {}))
        # load the configured validation split (reference finetune.yml sets
        # data.val.dataset.split: val — a held-out tuple db, NOT the train db)
        vsplit = vds_cfg.get("split", "val")
        vpkl = vds_cfg.get("dataset_pkl", ds_cfg.get("dataset_pkl"))
        vroot = vds_cfg.get("image_dir", ds_cfg.get("image_dir", ""))
        val_db, val_images = db, images
        if vpkl and (vsplit != ds_cfg.get("split", "train")
                     or vpkl != ds_cfg.get("dataset_pkl")):
            try:
                val_db, val_images = load_tuples_db(vpkl, vsplit, vroot)
            except (KeyError, OSError) as exc:  # pkl without the split
                warnings.warn("finetune val split %r unavailable (%s); "
                              "falling back to the train db" % (vsplit, exc))
        try:
            val_miner = TuplesMiner(
                val_db, nnum=int(vds_cfg.get("neg_num", 5)),
                qsize=int(min(float(vds_cfg.get("query_size", 200)), 1e6)),
                poolsize=int(min(float(vds_cfg.get("pool_size", 2000)), 1e6)),
                shuffle=False)
            gen_data2 = {"transforms": "pil2np | totensor | normalize",
                         "mean_std": [[0.5, 0.5, 0.5], [0.5, 0.5, 0.5]]}
            vtransform = initialize_transforms(gen_data2["transforms"],
                                               gen_data2["mean_std"])
            vdataset = TupleEpochDataset(val_db, val_images, vtransform,
                                         image_size, val_miner,
                                         augment_ratio=0.0)
            vdataset.extract_fn = _make_extract_fn(
                models, state, val_images, vtransform, image_size,
                augment_ratio=ratio, augment_label=label)
            vloader = Loader(vdataset, batch_size=1, num_workers=1)
            from gandtr_tpu.learning.training import LossValidation
            from gandtr_tpu.ops import losses as L

            def val_loss(st, imgs, msks, lbls, pmask):
                x = imgs[0]
                descs = models["embed"].apply(st.variables["embed"], x,
                                              train=False, mask=msks[0])
                return L.contrastive_loss(descs.T, lbls[0], num_tuples=1,
                                          margin=margin)

            validations.append(LossValidation(
                val_loss, vloader,
                frequency=val_section.get("frequency", 5),
                batch_to_args=lambda b: tuple(jnp.asarray(x) for x in b),
                # contrastive is a sum-reduction criterion: the reference
                # batch-normalizes before logging (validation.py:99-101);
                # our val loader is 1 tuple/batch so this divides by 1
                criterion_mean_reduction=False,
                # val mining must use the CURRENT weights (validation.py:87) —
                # without this the decisive val loss ranks checkpoints over
                # tuples mined with the epoch-0 network (found by review)
                on_validate=lambda st: vdataset.extract_fn.holder.__setitem__(
                    "state", st)))
        except Exception as exc:
            warnings.warn("finetune validation disabled: %s" % exc)

    # a loader-based SingleValidation makes "val/learning/loss:total" the
    # decisive criterion: the MIN val contrastive loss picks the _best
    # checkpoint (reference validation.py:58 + eventprocessor.py:122-134);
    # without (working) validation the permissive None keeps best == last
    events = initialize_processor(
        out_cfg, directory=directory,
        decisive_criterion="val/learning/loss:total" if validations else None)

    # dispatch_chunk (same semantics as the GAN build: lax.scan of K
    # identical steps per dispatch with a pipelined host-stack+upload;
    # auto-disabled under data-parallel)
    chunk = int(train_cfg.get("dispatch_chunk", 0) or 0)
    chunk_to_args = None
    if chunk > 1 and getattr(step, "gandtr_dp", False):
        import warnings as _warnings
        _warnings.warn("dispatch_chunk disabled: data-parallel step active")
        chunk = 0
    if chunk > 1:
        chunk_to_args = lambda batches: tuple(  # noqa: E731
            jnp.asarray(np.stack([np.asarray(b[i]) for b in batches]))
            for i in range(4))
        if loader is not None and hasattr(loader, "prefetch"):
            loader.prefetch = max(loader.prefetch, chunk + 2)

    training = None
    if loader is not None:
        training = Training(
            step_fn=step, loader=loader, epochs=epochs,
            seed=int(train_cfg.get("seed", 0)),
            optimizers_base_lr={"embed": base_lr},
            schedules={"embed": schedule},
            events=events, checkpoints=checkpoints, frozen=("augment",),
            validations=validations,
            batch_to_args=lambda b: tuple(jnp.asarray(x) for x in b),
            profile_dir=out_cfg.get("profile"),
            config_snapshot=config_snapshot, chunk=chunk,
            chunk_to_args=chunk_to_args)
        # mining must see the latest weights each epoch (reference re-mines
        # with the current network, traindataset.py:295-303)
        training.state_hook = lambda s, epoch, dbg: \
            dataset.extract_fn.holder.__setitem__("state", s)

    return {"models": models, "variables": variables, "state": state,
            "step": step, "training": training, "loader": loader,
            "events": events, "checkpoints": checkpoints, "dataset": dataset}


def _parse_ratio(wrappers_str):
    """Extract (ratio, label) from `...cir_ratio_pass_through:0.25:anc`."""
    if isinstance(wrappers_str, str) and "cir_ratio_pass_through" in wrappers_str:
        part = wrappers_str.split("cir_ratio_pass_through:", 1)[1]
        bits = part.split(",")[0].split(":")
        return float(bits[0]), bits[1] if len(bits) > 1 else "anc"
    return 0.0, "anc"


def _make_extract_fn(models, state_ref, images, transform, image_size,
                     augment_ratio=0.25, augment_label="anc",
                     device_fn=None):
    """Descriptor extraction over dataset indices for mining: batched
    square-padded masked embedding (mining runs through the SAME augment+embed
    pipeline as training, reference traindataset.py:216-243). The augmentation
    gate (ratio + label regex) comes from the configured
    cir_ratio_pass_through wrapper, not hardcoded defaults.

    `device_fn` (from transforms.split_device_transform) enables EXACT uint8
    staging: ship padded uint8 crops + (h, w), normalize in-graph (round-5:
    the f32 upload made mining extraction tunnel-transfer-bound)."""
    embed = models["embed"]
    augment = models["augment"]
    holder = {"state": state_ref}

    batch = 8
    # uint8 path: bigger batches amortize the per-dispatch RTT (the round-5
    # rehearsal measured mining dispatch-bound at batch 8); uint8 images
    # keep the upload modest (32 × ~400 KB ≈ 13 MB)
    u8_batch = 32

    def _fwd_py(variables, imgs, masks, pmask):
        out = augment.apply(variables["augment"], imgs, train=True,
                            ctx={"pass_mask": pmask}, mask=masks)
        if isinstance(out, tuple):  # exact bucket mode: updated valid rects
            x, masks = out
        else:
            x = out
        return embed.apply(variables["embed"], x, train=False, mask=masks)

    fwd = jax.jit(_fwd_py)

    @jax.jit
    def fwd_plain(variables, imgs, masks):
        """f32 twin of fwd_u8_plain: wrapped chain with the generator
        skipped (model_positions=()) for all-pass-through batches."""
        out = augment.apply(variables["augment"], imgs, train=True,
                            ctx={"pass_mask": jnp.zeros((imgs.shape[0],),
                                                        bool)},
                            mask=masks, model_positions=())
        if isinstance(out, tuple):
            x, masks = out
        else:
            x = out
        return embed.apply(variables["embed"], x, train=False, mask=masks)

    @jax.jit
    def fwd_u8(variables, imgs_u8, hws, pmask):
        N_, H_, W_ = imgs_u8.shape[:3]
        rows = jnp.arange(H_)[None, :, None]
        cols = jnp.arange(W_)[None, None, :]
        masks = ((rows < hws[:, 0, None, None]) &
                 (cols < hws[:, 1, None, None])).astype(jnp.float32)
        x = device_fn(imgs_u8.astype(jnp.float32) / 255.0, mask=masks)
        x = x * masks[..., None]  # pad band back to exact 0 (host path)
        return _fwd_py(variables, x, masks, pmask)

    @jax.jit
    def fwd_u8_plain(variables, imgs_u8, hws):
        """No-generator graph for pass-through images: identical arithmetic
        to fwd_u8 with an all-False pass mask — the ratio gate's `where` is
        the FIRST post (wrappers compose in reverse), so the outer wrappers
        (CLAHE, meanstd adaptation) still run on every row; only the module
        forward the gate would discard is skipped (model_positions=())."""
        N_, H_, W_ = imgs_u8.shape[:3]
        rows = jnp.arange(H_)[None, :, None]
        cols = jnp.arange(W_)[None, None, :]
        masks = ((rows < hws[:, 0, None, None]) &
                 (cols < hws[:, 1, None, None])).astype(jnp.float32)
        x = device_fn(imgs_u8.astype(jnp.float32) / 255.0, mask=masks)
        x = x * masks[..., None]
        pmask = jnp.zeros((N_,), bool)
        out = augment.apply(variables["augment"], x, train=True,
                            ctx={"pass_mask": pmask}, mask=masks,
                            model_positions=())
        if isinstance(out, tuple):
            x, masks = out
        else:
            x = out
        return embed.apply(variables["embed"], x, train=False, mask=masks)

    import re as _re
    anc_re = _re.compile(augment_label or "anc")

    def _prep_u8(chunk, passed):
        bucket = generator_safe_bucket(image_size)
        imgs, hws, pmask = [], [], []
        for idx in chunk:
            arr = np.asarray(imresize(imread(images[idx]), image_size))
            if arr.ndim == 2:
                arr = arr[:, :, None].repeat(3, axis=2)
            H, W = arr.shape[:2]
            out = np.zeros((bucket, bucket, 3), np.uint8)
            out[:min(H, bucket), :min(W, bucket)] = arr[:bucket, :bucket]
            imgs.append(out)
            hws.append((min(H, bucket), min(W, bucket)))
            pmask.append(passed)
        n = len(imgs)
        while len(imgs) < u8_batch:
            imgs.append(imgs[-1]); hws.append(hws[-1]); pmask.append(False)
        return (n, np.stack(imgs), np.asarray(hws, np.int32),
                np.asarray(pmask))

    def _run_u8_chunks(sub_idxs, augmented):
        """Pipelined uint8 extraction of one partition: decode+pad of batch
        N+1 runs in a prefetch thread while batch N computes, and the
        device_get of N-1 happens after N's async dispatch — the round-5
        fix for the dispatch-RTT-bound mining measured in the finetune
        rehearsal. Returns (len(sub_idxs), D)."""
        from concurrent.futures import ThreadPoolExecutor
        chunks = [sub_idxs[i0:i0 + u8_batch]
                  for i0 in range(0, len(sub_idxs), u8_batch)]
        vecs = []
        pending = None  # (device_out, n)
        with ThreadPoolExecutor(1) as ex:
            fut = ex.submit(_prep_u8, chunks[0], augmented)
            for ci in range(len(chunks)):
                n, im, hw, pm = fut.result()
                if ci + 1 < len(chunks):
                    fut = ex.submit(_prep_u8, chunks[ci + 1], augmented)
                if augmented:
                    out = fwd_u8(holder["state"].variables, jnp.asarray(im),
                                 jnp.asarray(hw), jnp.asarray(pm))
                else:
                    out = fwd_u8_plain(holder["state"].variables,
                                       jnp.asarray(im), jnp.asarray(hw))
                if pending is not None:
                    vecs.append(np.asarray(pending[0])[:pending[1]])
                pending = (out, n)
        vecs.append(np.asarray(pending[0])[:pending[1]])
        return np.concatenate(vecs, axis=0)

    def _extract_u8(idxs, gate):
        """Gate-partitioned extraction (round-5 late): the pass mask is a
        HOST-side hash of the image name (wrapper.py:131-135), known before
        dispatch — so pass-through images (ALL of the 22k 'neg-pool-mine'
        pool, ~75% of gated anchors at the protocol ratio) skip the frozen
        generator forward (the gate's `where` would discard it; the outer
        CLAHE/meanstd wrappers still apply — ~70% of the pool path's
        FLOPs). Per-image compute is batch-independent (instance norm /
        per-image CLAHE / VGG), so re-grouping is exact; results scatter
        back into input order."""
        idxs = list(idxs)
        if gate:
            flags = [cir_hash_passthrough(metadata_name(images[i]),
                                          augment_ratio) for i in idxs]
        else:
            flags = [False] * len(idxs)
        out = None
        for positions, augmented in (
                ([k for k, f in enumerate(flags) if f], True),
                ([k for k, f in enumerate(flags) if not f], False)):
            if not positions:
                continue
            vecs = _run_u8_chunks([idxs[k] for k in positions], augmented)
            if out is None:
                out = np.empty((len(idxs), vecs.shape[1]), vecs.dtype)
            out[np.asarray(positions)] = vecs
        return out.T  # (D, N)

    def extract(idxs, label="anc-mine"):
        gate = bool(anc_re.match(label))  # only gate-label extractions are
        # augmentation-gated (reference image_label regex, wrapper.py:131-135)
        if device_fn is not None:
            return _extract_u8(list(idxs), gate)
        # host-f32 fallback: same gate partition as _extract_u8 (the
        # generator forward is only dispatched for rows the gate passes)
        idxs = list(idxs)
        if gate:
            flags = [cir_hash_passthrough(metadata_name(images[i]),
                                          augment_ratio) for i in idxs]
        else:
            flags = [False] * len(idxs)
        full = None
        for positions, augmented in (
                ([k for k, f in enumerate(flags) if f], True),
                ([k for k, f in enumerate(flags) if not f], False)):
            if not positions:
                continue
            sub = [idxs[k] for k in positions]
            vecs = []
            for i0 in range(0, len(sub), batch):
                chunk = sub[i0:i0 + batch]
                bucket = generator_safe_bucket(image_size)
                imgs, masks = [], []
                for idx in chunk:
                    img = imresize(imread(images[idx]), image_size)
                    arr = transform(img)
                    H, W = arr.shape[:2]
                    out = np.zeros((bucket, bucket, 3), np.float32)
                    out[:H, :W] = arr[:bucket, :bucket]
                    m = np.zeros((bucket, bucket), np.float32)
                    m[:min(H, bucket), :min(W, bucket)] = 1.0
                    imgs.append(out)
                    masks.append(m)
                n = len(imgs)
                while len(imgs) < batch:  # pad last chunk to static batch
                    imgs.append(imgs[-1]); masks.append(masks[-1])
                pm = np.zeros(batch, bool)
                pm[:n] = augmented
                if augmented:
                    out = fwd(holder["state"].variables,
                              jnp.asarray(np.stack(imgs)),
                              jnp.asarray(np.stack(masks)),
                              jnp.asarray(pm))
                else:
                    out = fwd_plain(holder["state"].variables,
                                    jnp.asarray(np.stack(imgs)),
                                    jnp.asarray(np.stack(masks)))
                vecs.append(np.asarray(out)[:n])
            vecs = np.concatenate(vecs, axis=0)
            if full is None:
                full = np.empty((len(idxs), vecs.shape[1]), vecs.dtype)
            full[np.asarray(positions)] = vecs
        return full.T  # (D, N)

    extract.holder = holder
    return extract
