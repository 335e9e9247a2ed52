"""Product-quantized descriptor index (beyond-parity serving feature).

The exact index (serving/index.py) holds f32 descriptor rows on device:
2 GB for 1M x 512 — measured to take minutes to upload through narrow links
and to dominate device memory (docs/PERF.md "tunnel-upload pitfalls"). PQ
stores one uint8 code per subspace instead (m bytes/vector: 16-64x smaller),
and scans via per-query lookup tables — a TPU-friendly gather+add over int8
codes, with the codebook contractions on the MXU.

No reference counterpart (the reference ranks eval batches with host numpy,
cirscore.py:71-72); the API mirrors RetrievalIndex so serving/service.py and
the `build_index` stage accept either. Asymmetric distance (ADC): descriptors
are L2-normalized and ranked by inner product, so score(q, x) ~= sum_m
<q_m, C_m[code_m(x)]>. Optional exact re-rank of the PQ top-R from host-kept
f32 rows recovers exact top-k quality with device memory still O(N*m).
"""
import json
import os
import threading

import numpy as np
import jax
import jax.numpy as jnp

from gandtr_tpu.serving.index import exact_topk, merge_topk_parts, shard_rows


def train_product_quantizer(train_vecs, m, ksub=256, iters=25, seed=0):
    """Lloyd k-means per subspace, all subspaces at once (one jitted graph;
    assignment + update are einsums over the (m, n, dsub) view). Returns
    (m, ksub, dsub) float32 codebooks. Empty clusters keep their centroid."""
    X = np.ascontiguousarray(train_vecs, np.float32)
    n, d = X.shape
    if d % m:
        raise ValueError("dim %d not divisible by m=%d" % (d, m))
    if ksub > 256:
        raise ValueError("codes are uint8: ksub must be <= 256")
    ksub = min(ksub, n)
    rng = np.random.RandomState(seed)
    Xs = X.reshape(n, m, d // m).transpose(1, 0, 2)  # (m, n, dsub)
    init = Xs[:, rng.permutation(n)[:ksub], :].copy()  # (m, ksub, dsub)

    @jax.jit
    def lloyd(Xs, C0):
        def step(_, C):
            xc = jnp.einsum("mnd,mkd->mnk", Xs, C,
                            preferred_element_type=jnp.float32)
            c2 = jnp.sum(C * C, -1)
            assign = jnp.argmax(2.0 * xc - c2[:, None, :], -1)
            oh = jax.nn.one_hot(assign, C.shape[1], dtype=Xs.dtype)
            sums = jnp.einsum("mnk,mnd->mkd", oh, Xs,
                              preferred_element_type=jnp.float32)
            counts = jnp.sum(oh, 1)[..., None]
            return jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), C)
        return jax.lax.fori_loop(0, iters, step, C0)

    return np.asarray(lloyd(jnp.asarray(Xs), jnp.asarray(init)))


def _decode(codebooks, codes):
    """(N, m) codes -> (N, D) reconstruction (host numpy)."""
    return np.concatenate([codebooks[mi, codes[:, mi]]
                           for mi in range(codebooks.shape[0])], axis=1)


@jax.jit
def _assign(C, Xs):
    """Nearest-centroid assignment per subspace: argmin ||x-c||^2 via
    argmax(2<x,c> - ||c||^2). Xs (n, m, dsub) -> (n, m) i32. The ONE
    definition shared by k-means, encoding, and OPQ training."""
    xc = jnp.einsum("nmd,mkd->nmk", Xs, C, preferred_element_type=jnp.float32)
    c2 = jnp.sum(C * C, -1)
    return jnp.argmax(2.0 * xc - c2[None], -1)


def encode_chunked(C_dev, X, m, chunk=8192):
    """(N, D) rows -> (N, m) codes, device-assigned in bounded chunks."""
    out = []
    for i in range(0, X.shape[0], chunk):
        xs = X[i:i + chunk].reshape(-1, m, X.shape[1] // m)
        out.append(np.asarray(_assign(C_dev, jnp.asarray(xs))))
    return (np.concatenate(out, 0) if out
            else np.zeros((0, m), np.int32))


def train_opq_rotation(train_vecs, m, ksub=256, opq_iters=10, kmeans_iters=8,
                       seed=0):
    """OPQ-NP (Ge et al., CVPR'13): alternate codebook fit / encode / SVD
    Procrustes update of an orthogonal rotation R minimizing ||XR - q(XR)||².
    The k-means + encode run as the same jitted device einsums; the D×D SVD
    is host numpy. Returns (R (D, D), codebooks)."""
    X = np.ascontiguousarray(train_vecs, np.float32)
    d = X.shape[1]
    R = np.eye(d, dtype=np.float32)
    C = None
    for _ in range(opq_iters):
        Xr = X @ R
        C = train_product_quantizer(Xr, m, ksub, iters=kmeans_iters, seed=seed)
        codes = encode_chunked(jnp.asarray(C), Xr, m)
        Xq = _decode(C, codes)
        U, _, Vt = np.linalg.svd(X.T @ Xq, full_matrices=False)
        R = (U @ Vt).astype(np.float32)
    # final codebooks for the final rotation
    C = train_product_quantizer(X @ R, m, ksub, iters=kmeans_iters, seed=seed)
    return R, C


class PQRetrievalIndex:
    """RetrievalIndex-compatible PQ index.

    fit(train_vecs) trains the codebooks (or pass `codebooks=`); add() encodes
    rows to (N, m) uint8 codes; query() scans shard-parallel over devices.
    With rerank=R > 0, f32 rows are kept on HOST and the merged PQ top-R is
    exactly re-scored per query before cutting to k. With rotation=R (or
    fit(opq_iters=K)), rows and queries rotate by the learned OPQ orthogonal
    matrix before quantization — inner products are preserved exactly, so
    rerank semantics are unchanged."""

    def __init__(self, dim, m=16, ksub=256, devices=None, rerank=0,
                 codebooks=None, rotation=None):
        self.dim, self.m, self.ksub = int(dim), int(m), int(ksub)
        if self.dim % self.m:
            raise ValueError("dim %d not divisible by m=%d"
                             % (self.dim, self.m))
        self.rerank = int(rerank)
        self.devices = list(devices) if devices else [None]
        self.codebooks = None if codebooks is None else \
            np.ascontiguousarray(codebooks, np.float32)
        self.rotation = None if rotation is None else \
            np.ascontiguousarray(rotation, np.float32)
        self.names = []
        self._codes = []         # (N_i, m) uint8 blocks (host)
        self._exact = []         # (N_i, D) f32 blocks (host), iff rerank
        self._shards = None
        self._names_snap = ()     # immutable snapshot, rebuilt with shards
        self._exact_full = None   # cached concat of _exact, ditto
        self._scan_cache = {}     # jitted scan per k
        self._C_enc = None        # default-device codebooks for encoding
        self._lock = threading.Lock()

    def __len__(self):
        return sum(c.shape[0] for c in self._codes)

    # ------------------------------------------------------------------ fit
    def fit(self, train_vecs, iters=25, seed=0, opq_iters=0):
        """opq_iters > 0 additionally learns the OPQ rotation.

        Refitting after add() would silently pair old-codebook codes with the
        new codebooks: with rerank (exact rows kept) the rows re-encode here;
        without, refuse."""
        # validate BEFORE training or mutating: a caller that catches the
        # error must be left with the old, still-consistent index
        if self._codes and not self.rerank:
            raise RuntimeError(
                "fit() after add() without rerank: existing codes "
                "cannot be re-encoded (exact rows not kept) — fit "
                "before add, or use rerank>0")
        if opq_iters:
            rotation, codebooks = train_opq_rotation(
                train_vecs, self.m, self.ksub, opq_iters=opq_iters,
                kmeans_iters=max(iters // 3, 5), seed=seed)
        else:
            rotation, codebooks = self.rotation, train_product_quantizer(
                train_vecs, self.m, self.ksub, iters=iters, seed=seed)
        with self._lock:
            # swap under the lock so a concurrent query()/add() never pairs
            # old codes with new codebooks
            self.rotation, self.codebooks = rotation, codebooks
            self._C_enc = None
            self._shards = None
            if self._codes:
                rows = np.concatenate(self._exact, 0)
                self._codes = [self._encode(self._rotate(rows))]
                self._exact = [rows]
        return self

    def _rotate(self, X):
        return X if self.rotation is None else X @ self.rotation

    # ------------------------------------------------------------------ add
    def _encode(self, X):
        if self._C_enc is None:
            self._C_enc = jnp.asarray(self.codebooks)
        return encode_chunked(self._C_enc, X, self.m).astype(np.uint8)

    def add(self, names, descriptors):
        if self.codebooks is None:
            raise ValueError("fit() or pass codebooks= first")
        X = np.ascontiguousarray(descriptors, np.float32)
        if X.ndim == 1:
            X = X[None]
        if X.shape != (len(names), self.dim):
            raise ValueError("descriptors shape %s != (%d, %d)"
                             % (X.shape, len(names), self.dim))
        with self._lock:
            # encode under the lock: a fit() swapping codebooks mid-add must
            # not let codes from the OLD codebooks append after its re-encode
            codes = self._encode(self._rotate(X))  # exact rows stay UNROTATED
            self.names.extend(str(n) for n in names)
            self._codes.append(codes)
            if self.rerank:
                self._exact.append(X)
            self._shards = None

    # ---------------------------------------------------------------- query
    def _build_shards(self):
        full = (np.concatenate(self._codes, 0) if self._codes
                else np.zeros((0, self.m), np.uint8))
        # codes stay uint8 in HBM (the point of PQ); codebooks ride along
        # device-resident per shard so queries upload only the query batch
        self._shards = [
            (off, codes,
             jax.device_put(self.codebooks, dev) if dev is not None
             else jnp.asarray(self.codebooks))
            for (off, codes), dev in zip(shard_rows(full, self.devices),
                                         self.devices)]
        # per-query O(N) copies/concats move here (invalidated on add)
        self._names_snap = tuple(self.names)
        self._exact_full = (np.concatenate(self._exact, 0) if self._exact
                            else np.zeros((0, self.dim), np.float32))

    def _scan_fn(self, k):
        """(codes (n, m) i32, C, q (Nq, D)) -> top-k (vals, idx): LUT on the
        MXU, then an unrolled gather+add over the m code columns (each add
        fuses into the accumulator), then the exact recursive chunked top-k."""
        if k not in self._scan_cache:
            m, dsub = self.m, self.dim // self.m

            @jax.jit
            def fn(codes, C, q):
                lut = jnp.einsum("qmd,mkd->mqk", q.reshape(-1, m, dsub), C,
                                 preferred_element_type=jnp.float32)
                ci = codes.astype(jnp.int32)  # uint8 in HBM, i32 for gathers
                scores = jnp.take(lut[0], ci[:, 0], axis=1)  # (Nq, n)
                for mi in range(1, m):
                    scores = scores + jnp.take(lut[mi], ci[:, mi], axis=1)
                return exact_topk(scores, k)
            self._scan_cache[k] = fn
        return self._scan_cache[k]

    def query(self, qvecs, k=10):
        """Same contract as RetrievalIndex.query (scores are PQ-approximate
        unless rerank covers k)."""
        q = np.asarray(qvecs, np.float32)
        if q.ndim == 1:
            q = q[None]
        if q.shape[1] != self.dim:
            raise ValueError("query dim %d != index dim %d"
                             % (q.shape[1], self.dim))
        with self._lock:
            if self._shards is None:
                self._build_shards()
            shards, names, X = self._shards, self._names_snap, self._exact_full
        n = len(names)
        if n == 0:
            return [[] for _ in range(q.shape[0])]
        k = min(int(k), n)
        kfetch = min(max(k, self.rerank), n) if self.rerank else k
        # rotation is orthogonal: <qR, xR> == <q, x>, so ADC scores under
        # rotation estimate the same inner products
        qj = jnp.asarray(self._rotate(q))
        parts = []
        for offset, codes, C in shards:
            if codes.shape[0] == 0:
                continue
            kk = min(kfetch, codes.shape[0])
            vals, idx = self._scan_fn(kk)(codes, C, qj)
            parts.append((vals, idx, offset))
        vals, idx = merge_topk_parts(parts, kfetch)
        if self.rerank:
            out = []
            for qi in range(q.shape[0]):
                cand = idx[qi]
                ex = X[cand] @ q[qi]
                order = np.argsort(-ex, kind="stable")[:k]
                out.append([(names[cand[j]], float(ex[j])) for j in order])
            return out
        return [[(names[idx[qi, j]], float(vals[qi, j]))
                 for j in range(min(k, vals.shape[1]))]
                for qi in range(q.shape[0])]

    # ------------------------------------------------------------- persist
    def save(self, path):
        """Pickle-free .npz like RetrievalIndex.save."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with self._lock:
            codes = (np.concatenate(self._codes, 0) if self._codes
                     else np.zeros((0, self.m), np.uint8))
            exact = (np.concatenate(self._exact, 0) if self._exact
                     else np.zeros((0, self.dim), np.float32))
            names = np.asarray(self.names, dtype=str)
        codebooks = (self.codebooks if self.codebooks is not None
                     else np.zeros((0, 0, 0), np.float32))
        rotation = (self.rotation if self.rotation is not None
                    else np.zeros((0, 0), np.float32))
        np.savez_compressed(
            path, codes=codes, names=names, codebooks=codebooks,
            rotation=rotation, exact=exact,
            meta=json.dumps({"dim": self.dim, "m": self.m, "ksub": self.ksub,
                             "rerank": self.rerank}))

    @classmethod
    def load(cls, path, devices=None, rerank=None):
        with np.load(path if str(path).endswith(".npz")
                     else path + ".npz") as z:
            meta = json.loads(str(z["meta"]))
            if rerank is None:
                rerank = meta["rerank"]
            cb = z["codebooks"] if z["codebooks"].size else None
            rot = (z["rotation"] if "rotation" in z.files and
                   z["rotation"].size else None)
            idx = cls(meta["dim"], m=meta["m"], ksub=meta["ksub"],
                      devices=devices, rerank=rerank, codebooks=cb,
                      rotation=rot)
            codes = z["codes"].astype(np.uint8)
            if codes.shape[0]:
                idx.names = [str(n) for n in z["names"]]
                idx._codes = [codes]
                if rerank:
                    if z["exact"].shape[0] != codes.shape[0]:
                        raise ValueError(
                            "index was saved without exact rows; "
                            "rerank impossible")
                    idx._exact = [z["exact"]]
        return idx
