"""Path resolution + local/http file drivers with sha validation.

Mirrors daan's fs layer (/root/reference/mdir/external/daan/{core/
path_resolver.py, data/fs_driver.py}): `resolve_path` applies regex rewrite
rules (default: relative paths root at $GANDTR_ROOT), URLs download into a
local cache with optional sha256 content validation.
"""
import hashlib
import os
import re
import urllib.request


def _default_rules():
    """Read $GANDTR_ROOT at CALL time like the reference expands
    $CIRTORCH_ROOT per call (path_resolver.py:54) — setting the env var after
    import must take effect."""
    return [("^", os.environ.get("GANDTR_ROOT",
                                 os.environ.get("CIRTORCH_ROOT", "")))]


#: legacy alias — snapshotted rules; prefer passing rules= or the env var
DEFAULT_RULES = _default_rules()
CACHE_DIR = os.path.expanduser(os.environ.get(
    "GANDTR_CACHE", "~/.cache/gandtr_tpu"))


def resolve_path(path, rules=None):
    """Rewrite a path by the first matching rule (path_resolver.py:38-54);
    absolute paths and URLs pass through."""
    if path is None:
        return None
    path = os.path.expandvars(path)
    if path.startswith(("http://", "https://")) or os.path.isabs(path):
        return path
    for pattern, repl in (rules if rules is not None else _default_rules()):
        if re.search(pattern, path):
            return re.sub(pattern, repl.rstrip("/") + "/" if repl else "", path)
    return path


def sha256_of(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def embedded_sha_prefix(name):
    """The reference's filename-hash convention (fs_driver.py:101-107):
    'name-<sha256 hex prefix, >=8 chars>.ext' -> the prefix, else None."""
    m = re.search(r".*-([a-f0-9]{8,})\.[a-zA-Z0-9]{2,}$", name)
    return m.group(1) if m else None


def fetch(path_or_url, sha256=None, cache_dir=None):
    """Return a local path for a file or URL; downloads into the cache.

    Validation (fs_driver.py:101-122 semantics): an explicit `sha256=`
    full-hash check, plus the reference's automatic filename-embedded check —
    'name-<sha prefix>.ext' URLs validate the content on EVERY fetch (cache
    hits included), so a corrupted or colliding cache entry fails loudly.

    The cache is keyed by basename (torch-hub convention, and what lets a
    zero-egress host pre-seed ~/.cache/gandtr_tpu); hash-suffixed names are
    therefore collision-proof, plain names are the caller's responsibility.
    """
    if not path_or_url.startswith(("http://", "https://")):
        return path_or_url
    cache_dir = cache_dir or CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    fname = os.path.basename(path_or_url.split("?")[0])
    local = os.path.join(cache_dir, fname)
    if not os.path.exists(local):
        tmp = local + ".tmp"
        urllib.request.urlretrieve(path_or_url, tmp)
        os.replace(tmp, local)
    digest = None
    prefix = embedded_sha_prefix(fname)
    if sha256 or prefix:
        digest = sha256_of(local)
    if sha256 and digest != sha256:
        os.remove(local)
        raise IOError("sha256 mismatch for %s" % path_or_url)
    if prefix and digest[:len(prefix)] != prefix:
        os.remove(local)
        raise IOError("content hash %s... does not match the name-embedded "
                      "prefix %s (%s)" % (digest[:12], prefix, path_or_url))
    return local


def load_torch_checkpoint(path_or_url):
    """Load a torch .pth checkpoint into numpy (host-side torch dependency).

    Returns the raw object with tensors converted to numpy arrays.
    """
    import torch
    import numpy as np

    local = fetch(path_or_url)
    try:
        obj = torch.load(local, map_location="cpu", weights_only=False)
    except Exception:
        # plain-pickle checkpoints (e.g. convert_contained_net output)
        import pickle
        with open(local, "rb") as f:
            obj = pickle.load(f)

    def conv(o):
        if isinstance(o, torch.Tensor):
            return o.detach().cpu().numpy()
        if isinstance(o, dict):
            return {k: conv(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return type(o)(conv(v) for v in o)
        return o

    return conv(obj)


def normalize_network_checkpoint(state):
    """Normalize a loaded network checkpoint to the reference's in-memory
    layout `{"net": {...}, <embedded-net-name>: {...}, ...}`.

    The reference stores a network FILE as the FLAT dict
    {"type", "frozen", "network_params", "model_state"[, "_networks_included"]}
    and Checkpoints.load_network wraps it at load time
    (/root/reference/mdir/learning/checkpoints.py:209-220), splicing
    `_networks_included` as sibling nets. Accepts three layouts:
    the flat reference file, an already-wrapped {"net": ...} dict, and a
    plain parameter state-dict (wrapped as {"net": {"model_state": ...}}).

    (Found by the cross-engine oracle: our loaders previously required the
    "net" wrapper INSIDE the file, which real published .pth files do not
    have — tests/test_cross_engine_oracle.py.)
    """
    if not isinstance(state, dict):
        raise TypeError("checkpoint is not a dict: %r" % type(state))
    if "net" in state:
        out = dict(state)
        net = dict(out["net"])
        included = net.pop("_networks_included", {}) or {}
        assert "net" not in included
        out["net"] = net
        out.update(included)
        return out
    if "model_state" in state:
        net = dict(state)
        included = net.pop("_networks_included", {}) or {}
        assert "net" not in included
        return {"net": net, **included}
    return {"net": {"model_state": state}}


def load_pickle(path_or_url):
    import pickle
    with open(fetch(path_or_url), "rb") as f:
        return pickle.load(f)
