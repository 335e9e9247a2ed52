"""Model containers: the functional analog of the reference Network hierarchy
(/root/reference/mdir/learning/network.py).

A `WrappedNet` pairs a flax module with its wrapper chains and metadata — the
counterpart of SingleNetwork (network.py:92-243). `ModelSet` groups named nets
(NetworkSet, network.py:556-635); `SequentialNet` chains two nets with wrapper
rearrangement (SequentialNetwork/CirSequentialNetwork, network.py:639-753).

Variables (params/batch_stats pytrees) live OUTSIDE the containers, in the
train state — containers are static graph definitions, safe to close over in
jitted functions.
"""
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from gandtr_tpu.models import initialize_model
from gandtr_tpu.models.init import initialize_weights
from gandtr_tpu.learning.wrappers import initialize_wrappers, apply_wrapped


@dataclass
class WrappedNet:
    """A flax module + train/eval wrapper chains + meta (cf. SingleNetwork).

    `compute_dtype` enables mixed precision: parameters are cast to this dtype
    (and float inputs likewise) inside `apply` — the cast is traced, so
    gradients flow back to the f32 master params and optimizer state stays
    f32. BatchNorm running stats remain f32."""
    module: Any
    wrappers_train: List[Any] = field(default_factory=list)
    wrappers_eval: List[Any] = field(default_factory=list)
    frozen: bool = False
    meta: Dict[str, Any] = field(default_factory=dict)
    data_params: Dict[str, Any] = field(default_factory=dict)
    compute_dtype: Any = None

    def init(self, rng, x, **kwargs):
        return self.module.init(rng, x, **kwargs)

    def has_batch_stats(self, variables):
        return "batch_stats" in variables and jax.tree_util.tree_leaves(
            variables["batch_stats"])

    def apply(self, variables, x, train=False, ctx=None, mutable=False,
              rngs=None, model_positions=None, mask=None, **kwargs):
        """Apply with the stage-appropriate wrapper chain staged around the
        module (network.py:133 dispatch: train wrappers when training).

        `model_positions` (static tuple of batch indices) restricts the
        *module* to those rows, passing the others through unchanged — the
        wrappers still see the full batch. Used when a pass-through gate can
        only ever select those rows (e.g. the finetune augment generator and
        the 'anc'-only ratio gate): the generator's FLOPs drop to 1/S of the
        tuple without changing any gated result.

        `mask` ((N, H, W) valid-rectangle mask) enables the exact padded
        -bucket mode (ops/maskprop.py): the module receives it, mask-aware
        wrappers (clahepost, cir_ratio_pass_through) track the valid
        rectangle through ctx['mask_state'], and — when the module transforms
        images rather than reducing them to descriptors — apply returns
        (y, out_mask) so callers can chain exactly."""
        wrappers = self.wrappers_train if train else self.wrappers_eval
        call_kw = dict(kwargs)
        if self._accepts_train():
            call_kw["train"] = train and not self.frozen
        mask_through = [None]
        if mask is not None:
            from gandtr_tpu.ops.maskprop import MaskState
            ctx = dict(ctx or {})
            in_state = MaskState.maybe(mask)
            ctx["mask_state"] = in_state
            ctx["mask_state_in"] = in_state

        if self.compute_dtype is not None:
            dt = jnp.dtype(self.compute_dtype)
            variables = dict(variables)
            variables["params"] = jax.tree_util.tree_map(
                lambda a: a.astype(dt) if jnp.issubdtype(a.dtype, jnp.floating)
                else a, variables["params"])
            if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating):
                x = x.astype(dt)

        updates = {}

        def run_module(xx, row_mask=None):
            nonlocal updates
            kw = dict(call_kw)
            if mask is not None:
                kw["mask"] = row_mask if row_mask is not None else mask
            if mutable:
                out, upd = self.module.apply(variables, xx, mutable=mutable,
                                             rngs=rngs, **kw)
                updates = upd
            else:
                out = self.module.apply(variables, xx, rngs=rngs, **kw)
            if mask is not None and isinstance(out, tuple):
                # image-transforming module: (y, out_mask) convention
                out, out_mask = out
                mask_through[0] = out_mask
            return out

        def forward(xx):
            scale_mask = None
            if mask is not None and isinstance(xx, tuple):
                # multiscale pre emits (scaled_x, scaled_mask) pairs
                xx, scale_mask = xx
            if model_positions is None:
                out = run_module(xx, scale_mask)
            elif len(model_positions) == 0:
                # empty selection: the module never runs; the wrapper chain
                # (meanstd/CLAHE/ratio-gate) still applies to every row —
                # the exact graph an all-False pass mask reduces to (the
                # gate's `where` discards the module output row-wise, so a
                # batch known on host to pass nothing can skip the forward;
                # finetune_build._extract_u8's pool partition)
                out = xx
            else:
                sel = jnp.concatenate([xx[p:p + 1] for p in model_positions],
                                      axis=0)
                selm = None
                if mask is not None:
                    selm = jnp.concatenate([mask[p:p + 1]
                                            for p in model_positions], axis=0)
                out = run_module(sel, selm)
                y = xx
                for j, p in enumerate(model_positions):
                    y = jax.lax.dynamic_update_slice_in_dim(
                        y, out[j:j + 1].astype(y.dtype), p, axis=0)
                if mask_through[0] is not None:
                    # scatter the module rows' out-mask into the input mask;
                    # non-selected rows keep theirs (the ratio gate can only
                    # pass rows in model_positions, so the blend corrects any
                    # row the module did not really transform)
                    full = mask
                    for j, p in enumerate(model_positions):
                        full = jax.lax.dynamic_update_slice_in_dim(
                            full, mask_through[0][j:j + 1].astype(full.dtype),
                            p, axis=0)
                    mask_through[0] = full
                out = y
            if mask_through[0] is not None:
                from gandtr_tpu.ops.maskprop import MaskState
                ctx["mask_state"] = MaskState.maybe(mask_through[0])
            return out

        y = apply_wrapped(wrappers, forward, x, ctx)
        if mask is not None and mask_through[0] is not None:
            H, W = y.shape[1], y.shape[2]
            y = (y, ctx["mask_state"].mask(H, W, jnp.float32))
        if mutable:
            return y, updates
        return y

    def _accepts_train(self):
        import inspect
        try:
            sig = inspect.signature(self.module.__call__)
            return "train" in sig.parameters
        except (ValueError, TypeError):
            return False


@dataclass
class ModelSet:
    """Named bag of WrappedNets (cf. NetworkSet)."""
    nets: Dict[str, WrappedNet]

    def __getitem__(self, name):
        return self.nets[name]

    def init_all(self, rng, sample_inputs, init_specs=None, lazy=()):
        """Initialize variables for every subnet. `sample_inputs[name]` is the
        example input; `init_specs[name]` optionally holds a weight-init config
        ({'weights': 'kaiming_p2p', 'seed': 0})."""
        variables = {}
        for i, (name, net) in enumerate(self.nets.items()):
            if name not in sample_inputs:
                if name in lazy:
                    # lazily-shaped nets (CUT's PatchSampleF sizes its MLPs
                    # from generator feature taps) init'd by the caller
                    continue
                raise KeyError(
                    "no sample input for net %r (declare it in `lazy` if "
                    "the caller initializes it)" % name)
            key = jax.random.fold_in(rng, i)
            var = dict(net.init(key, sample_inputs[name]))
            spec = (init_specs or {}).get(name)
            if spec:
                if "params" in var:
                    var["params"] = initialize_weights(var["params"], key,
                                                       **spec)
                else:  # multihead: {'base': {...}, '<head>': {...}} nesting
                    for j, sv in enumerate(var.values()):
                        sv["params"] = initialize_weights(
                            sv["params"], jax.random.fold_in(key, 100 + j),
                            **dict(spec))
            variables[name] = var
        return variables


def build_single_net(config):
    """Build a WrappedNet from a reference-style SingleNetwork config subtree
    ({model: {...}, runtime: {wrappers, data}, initialize: ...})."""
    config = dict(config)
    model_params = dict(config.get("model", {}))
    model_params.pop("pretrained", None)  # checkpoint loading is external
    module = initialize_model(model_params)
    runtime = dict(config.get("runtime", {}))
    wrappers_cfg = runtime.get("wrappers", "")
    frozen = bool(runtime.get("frozen", False))
    compute_dtype = runtime.get("dtype") or config.get("dtype")
    if isinstance(wrappers_cfg, dict):
        train_w = initialize_wrappers(wrappers_cfg.get("train"))
        eval_w = initialize_wrappers(wrappers_cfg.get("eval"))
    else:
        train_w = eval_w = initialize_wrappers(wrappers_cfg)
    return WrappedNet(module=module, wrappers_train=train_w, wrappers_eval=eval_w,
                      frozen=frozen, meta=getattr(module, "meta", {}) or {},
                      data_params=runtime.get("data", {}) or {},
                      compute_dtype=compute_dtype)


def build_model_set(config):
    """Build a ModelSet from a NetworkSet config ({type: NetworkSet, <name>:
    {...}, ...}). Returns (model_set, init_specs)."""
    config = dict(config)
    assert config.pop("type", "NetworkSet") == "NetworkSet"
    nets, init_specs = {}, {}
    links = {}
    for name, sub in config.items():
        if sub is None:  # overlay-removed subnet (key*: null)
            continue
        sub = dict(sub)
        if sub.get("type") == "SingleNetworkLink":
            links[name] = sub.get("link") or sub.get("network")
            continue
        init_spec = sub.pop("initialize", None)
        if sub.get("type") == "MultiheadNetwork":
            nets[name] = build_multihead_net(sub)
        else:
            sub.pop("type", None)
            sub.pop("path", None)
            nets[name] = build_single_net(sub)
        if init_spec:
            init_specs[name] = dict(init_spec)
    for name, target in links.items():  # shared-module aliases (network.py:330)
        nets[name] = nets[target]
    return ModelSet(nets), init_specs


class MultiheadModule:
    """Base→(split)→heads composition (reference MultiheadNetwork,
    network.py:756-879): a shared base feeds an optional `split` net producing
    one piece per head (in head order), or — with no split — every head sees
    the base output directly. `default_output` selects the net returned by
    plain forward (base or a head, never the split — network.py:775);
    `head=` forces a single output like `single_output`. Functional:
    variables are {'base': ..., ('split': ...,) '<head>': ...};
    `parameter_groups` carries the reference's config-level per-subnet
    optimizer multipliers (network.py:764,844) consumed by
    optimizers.multihead_group_mults."""

    def __init__(self, base: WrappedNet, heads: Dict[str, WrappedNet],
                 default_output: Optional[str] = None,
                 split: Optional[WrappedNet] = None,
                 parameter_groups: Optional[Dict[str, Dict[str, float]]] = None):
        assert default_output is None or default_output == "base" \
            or default_output in heads, default_output
        self.base = base
        self.split = split
        self.heads = heads
        self.default_output = default_output
        self.parameter_groups = dict(parameter_groups or {})
        self.frozen = False
        self.meta: Dict[str, Any] = {}
        self.data_params = getattr(base, "data_params", {}) or {}

    def _pieces(self, variables, h, train):
        """Split the base output into per-head inputs (network.py:826-828:
        len(pieces) must equal the head count)."""
        if self.split is None:
            return {name: h for name in self.heads}
        pieces = self.split.apply(variables["split"], h, train=train)
        assert len(pieces) == len(self.heads), (len(pieces), len(self.heads))
        return dict(zip(self.heads, pieces))

    def init(self, rng, x, **kw):
        import jax
        variables = {"base": dict(self.base.init(rng, x, **kw))}
        h = self.base.apply(variables["base"], x)
        if self.split is not None:
            variables["split"] = dict(
                self.split.init(jax.random.fold_in(rng, 1000), h))
        pieces = self._pieces(variables, h, train=False)
        for i, (name, head) in enumerate(self.heads.items()):
            variables[name] = dict(head.init(jax.random.fold_in(rng, i),
                                             pieces[name]))
        return variables

    def apply(self, variables, x, head=None, train=False, **kw):
        h = self.base.apply(variables["base"], x, train=train, **kw)
        single = head if head is not None else self.default_output
        if single == "base":
            return h
        pieces = self._pieces(variables, h, train)
        if single is not None:
            return self.heads[single].apply(variables[single], pieces[single],
                                            train=train)
        # all-outputs dict reports base + every head (network.py:818-839)
        out = {"base": h}
        out.update({name: m.apply(variables[name], pieces[name], train=train)
                    for name, m in self.heads.items()})
        return out


def build_multihead_net(config):
    """Build a MultiheadModule from a reference-style MultiheadNetwork config
    ({type: MultiheadNetwork, network_order: "base,split,head...", runtime:
    {default_output, ...}, parameter_groups: {...}, <name>: subnet-config}).
    Mirrors MultiheadNetwork.initialize (network.py:841-846): network_order
    names base, split, then heads in order; default_output must not be the
    split."""
    config = dict(config)
    config.pop("type", None)
    order = [s.strip() for s in config.pop("network_order").split(",")]
    runtime = dict(config.pop("runtime", {}) or {})
    parameter_groups = dict(config.pop("parameter_groups", {}) or {})
    base_name, split_name, *head_names = order
    default_output = runtime.get("default_output")
    assert default_output in order and default_output != split_name, \
        default_output
    subs = {name: build_single_net(config[name]) for name in order}
    heads = {name: subs[name] for name in head_names}
    # variables are keyed 'base'/'split'/<head> — rewrite the config-level
    # group names for the base/split subnets to match
    pg = {("base" if k == base_name else "split" if k == split_name else k): v
          for k, v in parameter_groups.items()}
    mod = MultiheadModule(subs[base_name], heads,
                          default_output=("base" if default_output == base_name
                                          else default_output),
                          split=subs[split_name],
                          parameter_groups=pg)
    mod.data_params = (runtime.get("data")
                       or subs[base_name].data_params or {})
    return mod


class GlobalLocalModule:
    """Global + local descriptor container (reference GlobalLocalNetwork,
    network.py:374-517): `forward_global` pools one descriptor per image;
    `forward_local` returns multi-scale feature maps + attentions for the
    grouping layers. SCALES mirrors network.py:374-377."""

    SCALES = (1.0, 0.7071, 0.5, 0.3536, 0.25)

    def __init__(self, features: WrappedNet, pool_fn=None, attention_fn=None,
                 scales=None):
        from gandtr_tpu.ops import pooling as _pool
        from gandtr_tpu.models.extra_layers import l2norm_attention
        self.features = features
        self.pool_fn = pool_fn or (lambda f: _pool.gem(f))
        self.attention_fn = attention_fn or l2norm_attention
        self.scales = tuple(scales) if scales else self.SCALES

    def init(self, rng, x, **kw):
        return dict(self.features.init(rng, x, **kw))

    def forward_global(self, variables, x):
        from gandtr_tpu.ops.norm import l2n
        f = self.features.apply(variables, x)
        return l2n(self.pool_fn(f))

    def forward_local(self, variables, x):
        """Returns lists of (features NHWC, attention N,H,W,1) per scale."""
        from gandtr_tpu.ops.resize import scale_resize
        out = []
        for s in self.scales:
            xs = scale_resize(x, s) if s != 1.0 else x
            f = self.features.apply(variables, xs)
            out.append((f, self.attention_fn(f)))
        return out
