"""Torch checkpoint → flax variables conversion.

The reference distributes all pretrained weights as torch .pth state dicts
(generators, HED, GeM embedding nets — /root/reference/mdir/learning/
checkpoints.py:208-220, mdir/hub/model.py:17-45). Our flax modules name their
submodules after the torch module paths, so conversion is a mechanical walk of
the flax variable tree: path → torch key → layout transpose.

Layout rules:
- Conv2d weight (O, I, kH, kW) → flax kernel (kH, kW, I, O)
- ConvTranspose2d weight (I, O, kH, kW) → our ConvTranspose kernel (kH, kW, I, O)
- Linear weight (out, in) → flax Dense kernel (in, out)
- BatchNorm weight/bias/running_mean/running_var → scale/bias + batch_stats

INVARIANT the 4-D rule relies on: every regular conv kernel in this package
nests under models/layers.py Conv's 'conv' submodule; a 4-D kernel that is a
DIRECT leaf of its module (path[-2] != 'conv') is a ConvTranspose (IOHW
source layout). Do not add raw nn.Conv modules to importable models — for a
square I==O kernel the two transposes produce the same shape, so a violation
imports silently channel-swapped weights (caught once in RCF's dilated
conv5; fixed by routing it through layers.Conv with dilation).
"""
import numpy as np
import jax.numpy as jnp


def _default_torch_key(path):
    """('model_10', 'conv_block_1', 'conv', 'kernel') -> 'model.10.conv_block.1.weight'."""
    parts = []
    for p in path[:-1]:
        if p == "conv":  # our Conv wrapper submodule, absent in torch
            continue
        # split trailing integer index: model_10 -> model.10
        if "_" in p:
            head, _, tail = p.rpartition("_")
            if tail.isdigit():
                parts.extend([head, tail])
                continue
        parts.append(p)
    leaf = {"kernel": "weight", "scale": "weight", "bias": "bias",
            "mean": "running_mean", "var": "running_var"}[path[-1]]
    return ".".join(parts + [leaf])


def _transform(value, path, target_shape):
    v = np.asarray(value)
    if v.ndim == 4:
        if (len(path) > 1 and path[-2] == "conv") or path[-1] != "kernel":
            t = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        else:
            t = v.transpose(2, 3, 0, 1)  # ConvTranspose IOHW -> HWIO(=kh,kw,I,O)
    elif v.ndim == 2 and path[-1] == "kernel":
        t = v.transpose(1, 0)  # Linear (out,in) -> (in,out)
    else:
        t = v
    if tuple(t.shape) != tuple(target_shape):
        raise ValueError(f"Shape mismatch at {'.'.join(path)}: torch {v.shape} -> "
                         f"{t.shape}, flax expects {tuple(target_shape)}")
    return t


def _walk(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value


class ImportCoverageError(KeyError):
    """Raised when a torch-checkpoint import fills fewer flax leaves than the
    caller's `min_coverage` requires — a key-map mismatch against the real
    checkpoint layout would otherwise silently leave random weights in place
    (the reference errors via torch's strict load_state_dict,
    network.py:178)."""


def convert_torch_state(flax_variables, torch_state, key_map=None, strict=True,
                        prefix="", min_coverage=None):
    """Fill a flax variables dict ({'params': ..., 'batch_stats': ...}) from a
    torch state dict {name: ndarray}. `key_map(path) -> torch key` overrides the
    default mapping; `prefix` prepends to every generated torch key.

    `min_coverage` (0..1): minimum fraction of flax leaves that must be filled
    from the torch state; below it, ImportCoverageError lists the unmatched
    paths. Use 1.0 wherever a published full checkpoint is loaded (hub,
    scenario eval) so layout drift fails loudly instead of producing
    random-weight outputs."""
    # _to_mutable rebuilds the dict SKELETON (what _set mutates); the leaf
    # arrays are either replaced below or harmlessly alias the init arrays —
    # deepcopying them doubled host memory on VGG/ResNet imports for nothing
    out = {k: _to_mutable(v) for k, v in flax_variables.items()}
    used = set()
    total = 0
    matched = 0
    missing = []
    for collection, tree in out.items():
        for path, leaf in list(_walk(tree)):
            total += 1
            key = key_map(path) if key_map else None
            if key is None:
                key = _default_torch_key(path)
            key = prefix + key
            if key not in torch_state:
                missing.append((collection, ".".join(path), key))
                if strict:
                    raise KeyError(f"Missing torch key {key} for flax path "
                                   f"{collection}/{'/'.join(path)}")
                continue
            _set(tree, path, jnp.asarray(
                _transform(torch_state[key], path, leaf.shape), dtype=leaf.dtype))
            used.add(key)
            matched += 1
    if strict:
        unused = {k for k in torch_state if k not in used
                  and not k.endswith("num_batches_tracked")}
        if unused:
            raise KeyError(f"Unused torch keys: {sorted(unused)[:10]} "
                           f"({len(unused)} total)")
    if min_coverage is not None and total and matched < min_coverage * total:
        raise ImportCoverageError(
            f"Torch import matched {matched}/{total} flax leaves "
            f"(< {min_coverage:.0%}); unmatched: "
            f"{[f'{c}/{p} (wanted {k})' for c, p, k in missing[:8]]}"
            f"{' ...' if len(missing) > 8 else ''}")
    return out


def key_map_for_architecture(architecture):
    """Central architecture -> key-map selection for checkpoint imports."""
    arch = architecture or ""
    if arch in ("cirnet", "cirnet_inchan", "cirnet_attention", "gem_retrieval"):
        return retrieval_key_map
    if arch.startswith("hed"):
        return hed_key_map
    if arch == "rcf":
        from gandtr_tpu.models.rcf import rcf_key_map
        return rcf_key_map
    if arch == "official_p2p_mlp":
        return patchsample_key_map
    return None


def _to_mutable(tree):
    if hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def torch_state_to_numpy(state):
    """Detach a torch state dict into {name: np.ndarray} without keeping torch
    objects around (torch is a host-side import-time dependency only).

    Copies: `.numpy()` returns a VIEW of the torch buffer, and on the CPU
    backend `jnp.asarray` can alias it too — an in-place torch optimizer step
    afterwards would silently mutate the converted jax arrays."""
    return {k: np.array(v.detach().cpu().numpy(), copy=True)
            if hasattr(v, "detach") else np.array(v, copy=True)
            for k, v in state.items()}


# ---------------------------------------------------------------------------
# model-specific key maps
# ---------------------------------------------------------------------------

def hed_key_map(path):
    """vgg<b>_<c> -> vgg<b>.<torch_seq_idx>; score<i>/fusion are Sequentials."""
    p = path[:-1][0] if path[:-1] else ""
    leaf = {"kernel": "weight", "bias": "bias"}.get(path[-1], path[-1])
    if p.startswith("vgg"):
        block = p[3:p.index("_")]
        ci = int(p[p.index("_") + 1:])
        # first block: [conv relu conv relu]; others: [maxpool conv relu ...]
        tidx = ci * 2 + (0 if block == "1" else 1)
        return f"vgg{block}.{tidx}.{leaf}"
    if p.startswith("score"):
        return f"{p}.{leaf}"
    if p == "fusion":
        return f"fusion.0.{leaf}"
    return None


def patchsample_key_map(path):
    """mlp_<i>_<j> -> mlp_<i>.<0|2> (torch Sequential(Linear, ReLU, Linear))."""
    p = path[0]
    leaf = {"kernel": "weight", "bias": "bias"}[path[-1]]
    if p.startswith("mlp_"):
        i, j = p[4:].split("_")
        return f"mlp_{i}.{0 if j == '0' else 2}.{leaf}"
    return None


def retrieval_key_map(path):
    """GemRetrievalNet paths -> cirtorch ImageRetrievalNet state keys."""
    if path[-1] == "gem_p":
        return "pool.p"
    leaf = {"kernel": "weight", "scale": "weight", "bias": "bias",
            "mean": "running_mean", "var": "running_var"}[path[-1]]
    if path[0] == "net":  # GemRetrievalNetPreprocessing nests the plain net
        path = path[1:]
    if path[0] == "backbone":
        path = path[1:]
    head = path[0]
    if head == "preprocessing":  # EdgeFilter params (p, tau)
        return f"preprocessing.{path[-1]}"
    if head.startswith("features_"):  # vgg
        return f"features.{head.split('_')[1]}.{leaf}"
    if head in ("whiten", "lwhiten"):
        return f"{head}.{leaf}"
    if head.startswith("layer"):  # resnet: layer1_0 -> features.4.0 ...
        lnum = int(head[5])
        bnum = int(head.split("_")[1])
        inner = path[1]
        if inner.startswith("downsample_"):
            inner = "downsample." + inner.split("_")[1]
        return f"features.{3 + lnum}.{bnum}.{inner}.{leaf}"
    if head == "conv1":
        return f"features.0.{leaf}"
    if head == "bn1":
        return f"features.1.{leaf}"
    return None
