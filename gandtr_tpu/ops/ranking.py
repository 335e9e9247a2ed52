"""Retrieval ranking + mAP evaluation.

Ranking (`scores = V.T @ Q`, argsort) runs on device as a sharded MXU matmul —
the TPU-native replacement for the reference's CPU numpy ranking
(/root/reference/mdir/components/optim/score/cirscore.py:71-72). The mAP
computation itself is host-side numpy with junk-adjusted ranks, matching
/root/reference/mdir/external/cirtorch/utils/evaluate.py exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp


def rank_descriptors(vecs, qvecs):
    """Compute ranks on device. vecs: (D, Ndb), qvecs: (D, Nq).

    Returns (Ndb, Nq) ranks: ranks[r, q] = db index at rank r for query q.
    """
    vecs = jnp.asarray(vecs)
    qvecs = jnp.asarray(qvecs)
    scores = jnp.dot(vecs.T, qvecs, precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    ranks = jnp.argsort(-scores, axis=0, stable=True)
    return ranks


def compute_ap(ranks, nres):
    """Average precision from 0-based positive ranks (evaluate.py:3-37)."""
    nimgranks = len(ranks)
    ap = 0.0
    recall_step = 1.0 / nres
    for j in range(nimgranks):
        rank = ranks[j]
        precision_0 = 1.0 if rank == 0 else float(j) / rank
        precision_1 = float(j + 1) / (rank + 1)
        ap += (precision_0 + precision_1) * recall_step / 2.0
    return ap


def compute_map(ranks, gnd, kappas=()):
    """mAP + per-query AP + precision@k with junk handling (evaluate.py:39-111).

    ranks: (db_size, nq) 0-based; gnd: list of {'ok': ..., 'junk': ...} dicts.
    """
    ranks = np.asarray(ranks)
    kappas = list(kappas)
    nq = len(gnd)
    mAP = 0.0
    aps = np.zeros(nq)
    pr = np.zeros(len(kappas))
    prs = np.zeros((nq, len(kappas)))
    nempty = 0

    for i in range(nq):
        qgnd = np.array(gnd[i]["ok"])
        if qgnd.shape[0] == 0:
            aps[i] = float("nan")
            prs[i, :] = float("nan")
            nempty += 1
            continue
        qgndj = np.array(gnd[i].get("junk", np.empty(0)))

        pos = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgnd)]
        junk = np.arange(ranks.shape[0])[np.isin(ranks[:, i], qgndj)]

        # shift positives down by the number of junk entries before them
        if len(junk):
            shift = np.searchsorted(junk, pos)
            pos = pos - shift

        ap = compute_ap(pos, len(qgnd))
        mAP += ap
        aps[i] = ap

        pos = pos + 1  # 1-based for precision@k
        for j, kappa in enumerate(kappas):
            kq = min(max(pos), kappa)
            prs[i, j] = (pos <= kq).sum() / kq
        pr = pr + prs[i, :]

    denom = nq - nempty
    return mAP / denom, aps, pr / denom, prs


def compute_map_protocols(dataset, ranks, gnd, kappas=(1, 5, 10)):
    """E/M/H protocol evaluation for revisited datasets (evaluate.py:114-152).

    Returns ({metric: value}, {metric: per-query aps}).
    """
    if "ok" in gnd[0]:
        m, aps, _, _ = compute_map(ranks, gnd)
        return {"map": m}, {"ap": aps}

    def protocol(ok_keys, junk_keys):
        gnd_t = [{"ok": np.concatenate([np.asarray(g[k]).ravel() for k in ok_keys]),
                  "junk": np.concatenate([np.asarray(g[k]).ravel() for k in junk_keys])}
                 for g in gnd]
        return compute_map(ranks, gnd_t, kappas)

    mapE, apsE, _, _ = protocol(["easy"], ["junk", "hard"])
    mapM, apsM, _, _ = protocol(["easy", "hard"], ["junk"])
    mapH, apsH, _, _ = protocol(["hard"], ["junk", "easy"])
    return ({"map_easy": mapE, "map_medium": mapM, "map_hard": mapH},
            {"ap_easy": apsE, "ap_medium": apsM, "ap_hard": apsH})
