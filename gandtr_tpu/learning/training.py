"""Epoch-level training orchestration (host side).

The functional counterpart of the reference's EpochTraining/TrainValLearning
(/root/reference/mdir/learning/{training,learning}.py): per-epoch derived
seeds (seed + zero-based epoch, training.py:35-42,130), dataset prepare_epoch (re-sampling /
mining), per-epoch LR schedule factors injected into the optimizer hyperparams,
event logging, epoch checkpoints with best/last bookkeeping, and
epoch-granular resume.
"""
import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.data import transforms as T


_AUX_FIELDS = ("opt_states", "opt_state", "pools", "rng", "step")


def _aux_fields(state):
    """The non-variable training-state fields that must survive resume."""
    return {k: getattr(state, k) for k in _AUX_FIELDS if hasattr(state, k)}


def _aux_state_dict(state):
    import flax
    host = jax.tree_util.tree_map(lambda x: np.asarray(x),
                                  _aux_fields(state))
    return flax.serialization.to_state_dict(host)


def set_epoch_lr(opt_state, base_lr, factor):
    """Inject this epoch's learning rate into an inject_hyperparams state.

    Gated members of an OptimizerAlternation (alternate_iteration > 1) are
    wrapped in AlternationState(count, inner); the hyperparams live on the
    inner state, so unwrap recursively (mirrors optimizers.set_learning_rate).
    """
    from gandtr_tpu.learning.optimizers import AlternationState
    if isinstance(opt_state, AlternationState):
        return opt_state._replace(
            inner=set_epoch_lr(opt_state.inner, base_lr, factor))
    return opt_state._replace(hyperparams={
        **opt_state.hyperparams,
        "learning_rate": jnp.asarray(base_lr * factor, jnp.float32)})


def build_chunk_fn(step_fn):
    """One-dispatch multi-step driver: scan `step_fn` over K stacked batches
    inside a single jit. EXACTLY the per-step math in the per-step order
    (same state threading, same RNG stream); only the host<->device cadence
    changes — through the tunnel each plain dispatch pays ~1 s RTT
    (CLAUDE.md IO rules), so K steps per dispatch cut that to 1/K.

    Returns chunk_fn(state, *stacked) where stacked args carry a leading K
    axis; yields (state, metrics_with_K_axis[, last_step_debug])."""

    @jax.jit
    def chunk_fn(state, *stacked):
        first = tuple(a[0] for a in stacked)
        out0 = step_fn(state, *first)
        has_debug = len(out0) == 3
        rest = tuple(a[1:] for a in stacked)

        def body(carry, xs):
            s, _ = carry
            out = step_fn(s, *xs)
            return (out[0], out[2] if has_debug else None), out[1]

        (sf, dbgf), ms = jax.lax.scan(
            body, (out0[0], out0[2] if has_debug else None), rest)
        metrics = jax.tree_util.tree_map(
            lambda a0, ar: jnp.concatenate([a0[None], ar], 0), out0[1], ms)
        if has_debug:
            return sf, metrics, dbgf
        return sf, metrics

    return chunk_fn


class EpochLoop:
    """Generic epoch loop driving a jitted step function over a Loader.

    step_fn(state, *batch_arrays) -> (state, metrics_dict[, debug_dict])

    `chunk` > 1 batches K steps per device dispatch via build_chunk_fn;
    `chunk_to_args(batches) -> stacked device args` host-stacks the raw
    loader batches so the chunk uploads once (required with chunk).
    """

    def __init__(self, step_fn, loader, events=None, prefix="train/learning",
                 batch_to_args=None, chunk=0, chunk_to_args=None):
        self.step_fn = step_fn
        self.loader = loader
        self.events = events
        self.prefix = prefix
        self.batch_to_args = batch_to_args or (lambda batch: batch)
        self.chunk = int(chunk or 0)
        self.chunk_to_args = chunk_to_args
        self._chunk_fn = None
        if self.chunk > 1:
            assert chunk_to_args is not None, "chunk requires chunk_to_args"
            self._chunk_fn = build_chunk_fn(step_fn)

    def run_epoch(self, state, epoch):
        logger = (self.events.logger(self.prefix, epoch, len(self.loader))
                  if self.events else (lambda *a, **k: None))
        if hasattr(self.loader.dataset, "prepare_epoch"):
            self.loader.dataset.prepare_epoch()
        if self._chunk_fn is not None:
            return self._run_epoch_chunked(state, logger)
        last_debug = None
        for it, batch in enumerate(self.loader):
            args = self.batch_to_args(batch)
            out = self.step_fn(state, *args)
            if len(out) == 3:
                state, metrics, last_debug = out
            else:
                state, metrics = out
            # one host transfer for the whole dict — per-key float() costs a
            # device round-trip each on the tunnel (CLAUDE.md IO rules)
            metrics = jax.device_get(metrics)
            for key, value in metrics.items():
                logger(key, float(value), "scalar/loss", iteration=it)
        return state, last_debug

    def _run_epoch_chunked(self, state, logger):
        # Pipeline shape (round-5 rehearsal measurements): the stacked chunk
        # upload is the dominant per-chunk cost through the tunnel (~5.5 s
        # for 8 protocol batches at ~25-45 MB/s), so it runs in a prefetch
        # thread OVERLAPPING the previous chunk's device compute — dispatch
        # chunk N, then start uploading chunk N+1, then block on N's
        # metrics. Values are unchanged: the same chunk_to_args product is
        # handed to the same chunk_fn in the same order.
        from concurrent.futures import ThreadPoolExecutor
        last_debug = None
        it = 0

        def chunks():
            pending = []
            for batch in self.loader:
                pending.append(batch)
                if len(pending) == self.chunk:
                    yield pending
                    pending = []
            if pending:
                yield pending

        def prepare(pending):
            if len(pending) == 1:
                return pending, self.batch_to_args(pending[0])
            return pending, self.chunk_to_args(pending)

        with ThreadPoolExecutor(1) as ex:
            chunk_iter = chunks()
            first = next(chunk_iter, None)
            fut = ex.submit(prepare, first) if first is not None else None
            while fut is not None:
                pending, args = fut.result()
                nxt = next(chunk_iter, None)
                if len(pending) == 1:
                    out = self.step_fn(state, *args)
                    stepped = 1
                else:
                    out = self._chunk_fn(state, *args)
                    stepped = len(pending)
                # dispatch is async: start the NEXT chunk's host-stack +
                # upload before blocking on this chunk's metrics
                fut = ex.submit(prepare, nxt) if nxt is not None else None
                if len(out) == 3:
                    state, metrics, last_debug = out
                else:
                    state, metrics = out
                metrics = jax.device_get(metrics)
                for j in range(stepped):
                    for key, value in metrics.items():
                        logger(key,
                               float(value if stepped == 1 else value[j]),
                               "scalar/loss", iteration=it + j)
                it += stepped
        return state, last_debug


class Training:
    """TrainValLearning equivalent: loop epochs with schedules, validation,
    events, checkpoints, resume."""

    #: reference supervised_epoch.py:13 — traindata image samples are logged
    #: every 5th epoch (plus the first)
    LOG_TRAINDATA_SAMPLE_EVERY = 5

    def __init__(self, *, step_fn, loader, epochs, seed=0,
                 optimizers_base_lr=None, schedules=None, events=None,
                 checkpoints=None, validations=(), frozen=(),
                 batch_to_args=None, state_hook=None, profile_dir=None,
                 mean_std=None, config_snapshot=None, chunk=0,
                 chunk_to_args=None):
        self.loop = EpochLoop(step_fn, loader, events,
                              batch_to_args=batch_to_args, chunk=chunk,
                              chunk_to_args=chunk_to_args)
        self.epochs = epochs
        self.seed = seed
        self.base_lr = optimizers_base_lr or {}
        self.schedules = schedules or {}
        self.events = events
        self.checkpoints = checkpoints
        self.validations = list(validations)
        self.frozen = tuple(frozen)
        self.state_hook = state_hook
        # `output.learning.profile: <dir>` captures a jax.profiler trace of
        # the SECOND epoch (first-epoch compiles would drown the timeline) —
        # the TPU-native analog of the reference's StopWatch logs (§5.1)
        self.profile_dir = profile_dir
        self.mean_std = mean_std or ([0.5] * 3, [0.5] * 3)
        # validation/dataset config snapshot persisted with each checkpoint;
        # resume asserts it equals the current config (learning.py:46-50)
        self.config_snapshot = config_snapshot

    def _apply_schedules(self, state, epoch):
        """Inject this epoch's LR factor. Handles both state flavors: GAN
        states carry per-net `opt_states`; the finetune state carries a
        single `opt_state` (previously handled by a monkeypatched hook that
        run() never invoked — found by review)."""
        if hasattr(state, "opt_states"):
            opt_states = dict(state.opt_states)
            for name, sched in self.schedules.items():
                if name in opt_states:
                    opt_states[name] = set_epoch_lr(
                        opt_states[name], self.base_lr.get(name, 1.0),
                        sched(epoch - 1))
            return state.replace(opt_states=opt_states)
        if hasattr(state, "opt_state") and self.schedules:
            ((name, sched),) = list(self.schedules.items())[:1]
            return state.replace(opt_state=set_epoch_lr(
                state.opt_state, self.base_lr.get(name, 1.0),
                sched(epoch - 1)))
        return state

    def run(self, state, start_epoch=1):
        for epoch in range(start_epoch, self.epochs + 1):
            # reference per-epoch reseed is seed + ZERO-based epoch: its
            # internal counter starts at -1 (initialize_training
            # training.py:130) and set_seed(self.epoch + self.seed) runs
            # after +=1, i.e. seed+0 for the first epoch (training.py:35-42;
            # checkpoints name files epoch+1). Caught by the round-5
            # multi-seed oracle: seed+epoch (1-based) drew different 'any'
            # tuples than the reference in every epoch.
            T.seed_transforms(self.seed + epoch - 1)
            np.random.seed(self.seed + epoch - 1)
            state = self._apply_schedules(state, epoch)

            profile_this = self.profile_dir and epoch == min(2, self.epochs)
            if profile_this:
                import jax.profiler
                jax.profiler.start_trace(self.profile_dir)
            try:
                state, debug = self.loop.run_epoch(state, epoch)
            finally:
                if profile_this:
                    import jax.profiler
                    jax.profiler.stop_trace()

            if self.events:
                self._log_weight_norms(state, epoch)
                if debug and (epoch == 1 or
                              epoch % self.LOG_TRAINDATA_SAMPLE_EVERY == 0):
                    self._log_traindata_sample(debug, epoch)

            for val in self.validations:
                val(state, epoch, self.events)

            is_best = True
            if self.events:
                self.events.close_epoch(epoch)
                is_best = self.events.metadata.is_last_best()

            if self.checkpoints:
                # lazy thunk: materializing optimizer moments + event history
                # to host costs a device_get; save_epoch only calls it on
                # epochs that actually write a checkpoint
                self.checkpoints.save_epoch(
                    epoch, dict(state.variables),
                    train_state=lambda: {
                        "epoch": epoch,
                        "config": self.config_snapshot,
                        "events": self.events.state_dict() if self.events else None,
                        # optimizer moments / replay pools / rng / step — the
                        # reference restores optimizer state on resume
                        # (training.py:68-69); variables alone are not a
                        # faithful resume
                        "aux": _aux_state_dict(state)},
                    frozen=self.frozen, is_best=is_best,
                    is_last=(epoch == self.epochs))
            if self.state_hook:
                self.state_hook(state, epoch, debug)
        return state

    def _log_weight_norms(self, state, epoch):
        """Per-subnet parameter events: L2-norm scalars plus the reference's
        per-parameter weight histograms (supervised_epoch.py:110-115 +
        network.py:81-82 'net/params' dict events; the broker reduces each
        array to a 200-bin histogram on arrival)."""
        logger = self.events.logger("train/weights", epoch)
        variables = getattr(state, "variables", None)
        if not isinstance(variables, dict):
            return
        for name, var in variables.items():
            params = var.get("params") if isinstance(var, dict) else None
            if params is None:
                continue
            leaves = jax.tree_util.tree_leaves_with_path(params)
            sq = sum(float(jnp.sum(jnp.square(l))) for _, l in leaves)
            logger(f"{name}/l2", float(np.sqrt(sq)), "scalar/score")
            logger(f"{name}/params",
                   {jax.tree_util.keystr(path, simple=True, separator="."):
                    np.asarray(leaf) for path, leaf in leaves},
                   "weight/param")

    def _log_traindata_sample(self, debug, epoch):
        """Denormalized sample images from the epoch's last debug dict as
        image blobs — reference supervised_epoch.py:116-156,194-199: key
        `data/<label>/image0.rgb` for the first 3 channels plus
        `.../image0.chanK` grayscale for every extra channel; images with
        fewer than 3 channels log each channel gray. A 1-channel image under
        a 3-channel mean/std is logged raw (mean 0/std 1), matching the
        reference's grayscale override (supervised_epoch.py:136-139). Skips
        non-arrays and tiny maps (<20px), like the reference."""
        logger = self.events.logger("data", epoch)
        mean = np.asarray(self.mean_std[0], np.float32)
        std = np.asarray(self.mean_std[1], np.float32)
        # ONE transfer for the whole dict — per-entry device_get costs a
        # tunnel round-trip each (EpochLoop's metrics rule, CLAUDE.md)
        debug = jax.device_get(debug)
        for label, img in debug.items():
            if isinstance(img, dict):  # text entries, e.g. image labels
                for key, value in img.items():  # (supervised_epoch.py:119-121)
                    logger("%s/%s" % (label, key), str(np.asarray(value).tolist()),
                           "blob")
                continue
            img = np.asarray(img)
            if img.ndim == 4:
                img = img[0]
            if img.ndim != 3 or min(img.shape[:2]) < 20:
                continue
            c = img.shape[-1]
            # reference gate (supervised_epoch.py:130-134): only 1-channel or
            # exactly-len(mean_std) images are loggable
            if c != 1 and c != len(mean):
                continue
            m, s = mean, std
            if c == 1 and len(mean) > 1:
                m, s = np.zeros(1, np.float32), np.ones(1, np.float32)
            if c >= 3:
                logger("%s/image0.rgb" % label,
                       np.clip(img[..., :3] * s[:3] + m[:3], 0, 1), "blob")
            for k in range(3 if c >= 3 else 0, c):
                logger("%s/image0.chan%d" % (label, k + 1),
                       np.clip(img[..., k] * s[k] + m[k], 0, 1), "blob")

    def resume_or_start(self, state, templates=None):
        """Epoch-granular resume (learning.py:40-59): reload latest epoch's
        variables + optimizer/pool/rng/step aux state + events, return
        (state, start_epoch)."""
        if not self.checkpoints:
            return state, 1
        epoch, train_meta = self.checkpoints.load_latest_epoch()
        if epoch is None:
            return state, 1
        # the reference refuses to resume under a changed validation/dataset
        # config (learning.py:46-50) — silent drift would corrupt the
        # experiment's comparability
        saved_cfg = (train_meta or {}).get("config")
        if (saved_cfg is not None and self.config_snapshot is not None
                and saved_cfg != self.config_snapshot):
            # explicit raise: user-facing validation must survive python -O
            raise RuntimeError(
                "resume config mismatch:\ncheckpoint: %r\ncurrent:    %r"
                % (saved_cfg, self.config_snapshot))
        variables = {
            name: self.checkpoints.load_net(name, epoch, state.variables[name])
            for name in state.variables}
        state = state.replace(variables=variables)
        if train_meta and train_meta.get("aux"):
            import flax
            template = _aux_fields(state)
            restored = flax.serialization.from_state_dict(
                template, train_meta["aux"])
            state = state.replace(**restored)
        if self.events and train_meta and train_meta.get("events"):
            self.events.load_state_dict(train_meta["events"])
        return state, epoch + 1


def should_validate(frequency, epoch):
    """Reference validation.py:73-74: `epoch is None or (frequency and
    (epoch + 1) % frequency == 0)`. Our training epochs are 1-based (the
    reference's are 0-based, hence its +1), and `epoch=None` marks an
    explicit validate-stage run, which always validates. A falsy frequency
    (null/0) therefore never validates during training — the reference's
    eval.yml uses `frequency: null` for exactly that."""
    return epoch is None or (bool(frequency) and epoch % int(frequency) == 0)


class VisualValidation:
    """Run the generator over fixed validation images and log outputs as blobs
    (reference optim/score/visual.py:12-91)."""

    def __init__(self, model, images, mean_std=((0.5,) * 3, (0.5,) * 3),
                 net_name="generator_X", key="val/visual", frequency=1,
                 names=None):
        self.model = model
        self.images = images  # (N, H, W, C) normalized
        self.mean = np.asarray(mean_std[0])
        self.std = np.asarray(mean_std[1])
        self.net_name = net_name
        self.key = key
        self.frequency = frequency
        # image-stem keys like the reference (visual.py:68-76: blobs are
        # logged per extension-less file name); indices when unnamed
        self.names = ([n.rsplit("/", 1)[-1].rsplit(".", 1)[0] for n in names]
                      if names else None)
        self._jit = None

    def __call__(self, state, epoch, events):
        if events is None or not should_validate(self.frequency, epoch):
            return
        if self._jit is None:
            self._jit = jax.jit(lambda v, x: self.model.apply(v, x, train=False))
        # `images` is a stacked (N,H,W,C) array when shapes agree, or a list
        # of (H,W,C) arrays — the reference loads val images at batch_size=1
        # precisely because aspect-preserving downscale yields mixed shapes
        # (visual.py:53); per-shape jit cache like the infer stage
        if isinstance(self.images, (list, tuple)):
            out = [np.asarray(self._jit(state.variables[self.net_name],
                                        img[None]))[0]
                   for img in self.images]
        else:
            out = np.asarray(self._jit(state.variables[self.net_name],
                                       self.images))
        logger = events.logger("", epoch)
        for i, img in enumerate(out):
            c = img.shape[-1]
            m, s = self.mean, self.std
            if c == 1 and len(m) > 1:
                # grayscale output under RGB stats: log raw, 2-D (the
                # reference's gray override, supervised_epoch.py:136-139)
                m, s = np.zeros(1), np.ones(1)
            rgb = np.clip(img * s[:c] + m[:c], 0, 1)
            if rgb.shape[-1] == 1:
                rgb = rgb[..., 0]  # PIL needs 2-D for gray
            label = self.names[i] if self.names and i < len(self.names) \
                else str(i)
            logger(f"{self.key}/{label}", rgb, "blob")


class LossValidation:
    """SingleValidation equivalent (validation.py:60-118): criterion loss over
    a val loader every `frequency` epochs."""

    def __init__(self, loss_fn, loader, frequency=1,
                 key="val/learning/loss:total", batch_to_args=None,
                 criterion_mean_reduction=True, on_validate=None):
        self.loss_fn = loss_fn
        self.loader = loader
        self.frequency = frequency
        self.key = key
        self.batch_to_args = batch_to_args or (lambda b: b)
        # called with the CURRENT state before prepare_epoch: the reference
        # re-mines val tuples with the current network (validation.py:87)
        self.on_validate = on_validate
        # reference validation.py:99-101: sum-reduction criteria are
        # "always reported batch-normalized" — divided by the number of
        # items (tuples) in the batch before logging
        self.criterion_mean_reduction = criterion_mean_reduction

    def __call__(self, state, epoch, events):
        if not should_validate(self.frequency, epoch):
            return
        if self.on_validate is not None:
            self.on_validate(state)
        if hasattr(self.loader.dataset, "prepare_epoch"):
            self.loader.dataset.prepare_epoch()
        losses = []
        for batch in self.loader:
            loss = float(self.loss_fn(state, *self.batch_to_args(batch)))
            if not self.criterion_mean_reduction:
                loss /= max(len(batch[0]), 1)
            losses.append(loss)
        if events and losses:
            events.logger("", epoch)(self.key, float(np.mean(losses)), "scalar/loss")


class MultiCriterialValidation:
    """Named child validations with a decisive criterion (reference
    validation.py:121-156): runs each child, used with the events
    MetadataKeeper to drive best-epoch selection."""

    def __init__(self, children, decisive_criterion=None):
        self.children = dict(children)
        self.decisive_criterion = decisive_criterion

    def __call__(self, state, epoch, events):
        for name, child in self.children.items():
            child(state, epoch, events)


class ScoreValidation:
    """Retrieval-mAP score validation during training (reference CirDatasetAp,
    optim/score/cirscore.py:51-83): every `frequency` epochs, run the full
    descriptor extraction + ranking + protocol mAP over a configured test
    dataset and log per-protocol scores."""

    def __init__(self, embed_net, dataset, dir_main, image_size=1024,
                 transform=None, frequency=1, net_name="embed",
                 key_prefix="val/validation"):
        self.embed_net = embed_net
        self.dataset = dataset
        self.dir_main = dir_main
        self.image_size = image_size
        self.transform = transform
        self.frequency = frequency
        self.net_name = net_name
        self.key_prefix = key_prefix
        self._cfg = None  # dataset parsed once, like the reference __init__

    def _dataset_cfg(self):
        """Parse the dataset spec once and cache it (reference CirDatasetAp
        builds images/bbxs/gnd in __init__, cirscore.py:26-40) — the tsv
        files would otherwise be re-read every validation epoch."""
        if self._cfg is None:
            from gandtr_tpu.eval.retrieval import (configdataset,
                                                   configdataset_tsv)
            if isinstance(self.dataset, dict):
                # reference tsv dataset form {name, queries, db, imgdir}
                self._cfg = configdataset_tsv(self.dataset)
            else:
                self._cfg = configdataset(self.dataset, self.dir_main)
        return self._cfg

    def __call__(self, state, epoch, events):
        if not should_validate(self.frequency, epoch):
            return
        from gandtr_tpu.eval.retrieval import (ShapeCachedExtractor,
                                               evaluate_dataset)
        variables = state.variables[self.net_name] \
            if isinstance(state.variables, dict) and self.net_name in state.variables \
            else state.variables
        import inspect
        accepts_train = "train" in inspect.signature(
            type(self.embed_net).__call__).parameters
        if accepts_train:
            fwd = lambda v, x: self.embed_net.apply(v, x, train=False)  # noqa: E731
        else:
            fwd = lambda v, x: self.embed_net.apply(v, x)  # noqa: E731
        extractor = ShapeCachedExtractor(fwd, variables)
        cfg = self._dataset_cfg()
        import time as _time
        t0 = _time.time()
        metrics, aps, _, _ = evaluate_dataset(extractor, cfg, self.image_size,
                                              self.transform)
        if events:
            nq = len(next(iter(aps.values()))) if aps else 0
            logger = events.logger("", epoch, epoch_size=nq)
            logger(f"{self.key_prefix}/{cfg['dataset']}/dataset:eval",
                   _time.time() - t0, "scalar/time")
            for mk, mv in metrics.items():
                logger(f"{self.key_prefix}/{cfg['dataset']}/score_avg:{mk}",
                       float(mv), "scalar/score")
            # per-query APs, one event per query like the reference
            # (cirscore.py:80-83) — they feed the report distributions
            for mk, mv in aps.items():
                for i, v in enumerate(np.asarray(mv).tolist()):
                    logger(f"{self.key_prefix}/{cfg['dataset']}/score:{mk}",
                           float(v), "scalar/score", iteration=i)
