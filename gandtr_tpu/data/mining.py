"""Hard-negative mining + diverse-anchor selection for tuple training.

Re-design of cirtorch's TuplesDataset mining
(/root/reference/mdir/external/cirtorch/datasets/traindataset.py:210-303) and
DiverseAnchorsDataset (/root/reference/mdir/components/data/dataset/
cirtorch_datasets.py:53-115) as an epoch-boundary host/device hybrid:
descriptor extraction and the poolvecs.T @ qvecs ranking run on TPU (batched,
shardable); the greedy cluster-dedup / percentile-window selection loops run on
host numpy (they are tiny and inherently sequential).
"""
import numpy as np


def cid2filename(cid, prefix=""):
    """retrieval-SfM cid -> nested path (datahelpers.py:18-37): absolute cids
    pass through; a '*' in the prefix substitutes the hash path (the shipped
    configs use image_dir: .../ims/* — found by review)."""
    if cid and cid[0] == "/":
        return cid
    path = "/".join([cid[-2:], cid[-4:-2], cid[-6:-4], cid])
    if "*" in prefix:
        return prefix.replace("*", path)
    return "/".join([prefix, path]) if prefix else path


def search_hard_negatives(qvecs, poolvecs, qidxs, idxs2images, clusters, nnum,
                          rank_fn=None):
    """Greedy top-ranked negatives with cluster dedup
    (traindataset.py:246-279). qvecs: (D, Nq), poolvecs: (D, Npool).

    Returns (nidxs, stats). `rank_fn` defaults to the on-device ranking matmul.
    """
    if rank_fn is None:
        from gandtr_tpu.ops.ranking import rank_descriptors
        ranks = np.asarray(rank_descriptors(poolvecs, qvecs))
    else:
        ranks = rank_fn(poolvecs, qvecs)

    qvecs = np.asarray(qvecs)
    poolvecs = np.asarray(poolvecs)
    nidxs = []
    ndist_acc = []
    for q in range(len(qidxs)):
        qcluster = clusters[qidxs[q]]
        picked_clusters = [qcluster]
        nidx = []
        r = 0
        while len(nidx) < nnum:
            pool_pos = ranks[r, q]
            potential = idxs2images[pool_pos]
            if clusters[potential] not in picked_clusters:
                nidx.append(potential)
                picked_clusters.append(clusters[potential])
                ndist = np.sqrt(np.sum(
                    (qvecs[:, q] - poolvecs[:, pool_pos] + 1e-6) ** 2))
                ndist_acc.append(float(ndist))
            r += 1
        nidxs.append(nidx)
    return nidxs, {"average_negative_distance": ndist_acc}


def select_diverse_queries(qvecs, qsize, similar_exclude, similar_include,
                           shuffle=True, rng=None):
    """Greedy diverse-anchor selection (cirtorch_datasets.py:78-105): iterate,
    picking the next query from a percentile window of max-similarity to the
    already-picked set. qvecs: (D, Nqpool). Returns (indices, score_acc)."""
    rng = rng or np.random
    qvecs = np.asarray(qvecs)
    qpool_size = qvecs.shape[1]
    idx = 0
    idxs = [idx]
    most_similar = np.full(qpool_size, -np.inf)
    qscore_acc = []
    for _ in range(qsize - 1):
        dist = qvecs.T @ qvecs[:, idx]
        most_similar = np.maximum(most_similar, dist)
        valid_size = qpool_size - len(idxs)
        similar_split = max(int(valid_size * (1 - similar_exclude)), 1)
        dissimilar_split = min(int(valid_size * (1 - similar_include)),
                               similar_split - 1)
        order = np.argsort(most_similar, kind="stable")
        dissimilar_part = order[dissimilar_split:similar_split]
        if shuffle:
            choice = int(rng.randint(dissimilar_part.shape[0]))
        else:
            choice = dissimilar_part.shape[0] - 1
        idx = int(dissimilar_part[choice])
        qscore_acc.append(float(most_similar[idx]))
        idxs.append(idx)
    return idxs, qscore_acc


def mark_easy_difficulties(qvecs, pvecs, mark_easy, qsize):
    """"-easy"/"-hard" label suffixes for the top `mark_easy*qsize` tuples by
    anchor-positive similarity (cirtorch_datasets.py:106-111)."""
    sim_ord = np.argsort(np.sum(np.asarray(qvecs) * np.asarray(pvecs), axis=0),
                         kind="stable")
    easy_set = set(sim_ord[-int(mark_easy * qsize):].tolist())
    return ["-easy" if i in easy_set else "-hard" for i in range(qvecs.shape[1])]


class TuplesMiner:
    """Epoch-boundary tuple mining (create_epoch_tuples equivalent).

    db: {'qidxs': [...], 'pidxs': [...], 'cluster': [...], 'cids'/'images'}.
    `extract_fn(image_indices) -> (D, N) descriptors` is supplied by the
    caller (batched TPU extraction over the dataset's images).
    """

    def __init__(self, db, nnum=5, qsize=2000, poolsize=22000, shuffle=True,
                 seed=0, qpool_size=None, similar_exclude=None,
                 similar_include=None, mark_easy=None, first_neg="neg"):
        self.db = db
        self.nnum = nnum
        self.num_images = len(db.get("cids", db.get("images", [])))
        self.qsize = min(qsize, len(db["qidxs"]))
        self.poolsize = min(poolsize, self.num_images)
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.diverse = qpool_size is not None
        assert first_neg in ("neg", "pos", "exc"), first_neg
        self.first_neg = first_neg
        self.mark_easy = mark_easy if mark_easy is None else float(mark_easy)
        assert mark_easy is None or (self.diverse and 0 <= self.mark_easy <= 1)
        if self.diverse:
            self.qpool_size = min(qpool_size, len(db["qidxs"]))
            # reference fail-fast (cirtorch_datasets.py:69): selecting more
            # diverse queries than the pool holds would re-pick duplicates
            if self.qsize > self.qpool_size:
                raise ValueError("query_size %d > qpool_size %d"
                                 % (self.qsize, self.qpool_size))
            self.similar_exclude = similar_exclude
            self.similar_include = similar_include

    def _randperm(self, size, samples):
        if self.shuffle:
            return list(self.rng.permutation(size)[:samples])
        return list(range(size))[:samples]

    @staticmethod
    def _extract(extract_fn, idxs, label):
        """Pass the extraction label when supported — the reference tags mining
        extractions ('anc-mine', 'neg-pool-mine', traindataset.py:216-220) and
        the augmentation gate's regex only matches anchors."""
        try:
            return extract_fn(idxs, label=label)
        except TypeError:
            return extract_fn(idxs)

    def create_epoch_tuples(self, extract_fn):
        """Returns (qidxs, pidxs, nidxs, labels, stats)."""
        stats = {}
        if self.diverse:
            idxs2qpool = self._randperm(len(self.db["qidxs"]), self.qpool_size)
            qidxs = [self.db["qidxs"][i] for i in idxs2qpool]
            pidxs = [self.db["pidxs"][i] for i in idxs2qpool]
            qvecs = np.asarray(self._extract(extract_fn, qidxs, "anc-pool-mine"))
            sel, qscore = select_diverse_queries(
                qvecs, self.qsize, self.similar_exclude, self.similar_include,
                self.shuffle, self.rng)
            qidxs = [qidxs[i] for i in sel]
            pidxs = [pidxs[i] for i in sel]
            qvecs = qvecs[:, sel]
            stats["average_new_query_max_score"] = qscore
            if self.mark_easy is not None:
                pvecs = np.asarray(self._extract(extract_fn, pidxs,
                                                 "pos-pool-mine"))
                self._difficulties = mark_easy_difficulties(
                    qvecs, pvecs, self.mark_easy, self.qsize)
        else:
            idxs2qpool = self._randperm(len(self.db["qidxs"]), self.qsize)
            qidxs = [self.db["qidxs"][i] for i in idxs2qpool]
            pidxs = [self.db["pidxs"][i] for i in idxs2qpool]
            if self.nnum:
                # positives-only mode skips the anchor extraction entirely
                # (traindataset.py:281-293 returns dummy nidxs first) — a
                # full per-epoch extraction pass would be discarded below
                qvecs = np.asarray(self._extract(extract_fn, qidxs,
                                                 "anc-mine"))

        if self.nnum == 0:
            return qidxs, pidxs, [[] for _ in qidxs], self._labels(len(qidxs)), stats

        idxs2images = self._randperm(self.num_images, self.poolsize)
        poolvecs = np.asarray(self._extract(extract_fn, idxs2images,
                                            "neg-pool-mine"))
        nidxs, nstats = search_hard_negatives(
            qvecs, poolvecs, qidxs, idxs2images, self.db["cluster"], self.nnum)
        stats.update(nstats)
        return qidxs, pidxs, nidxs, self._labels(len(qidxs)), stats

    def _labels(self, n):
        """Per-position label rows; "-easy"/"-hard" suffixes under mark_easy
        and the first_neg override (cirtorch_datasets.py:112-114)."""
        rows = ["anc", "pos"]
        if self.nnum:
            rows += [self.first_neg] + ["neg"] * (self.nnum - 1)
        diffs = getattr(self, "_difficulties", None) or [""] * n
        return [[x + y for y in diffs] for x in rows]
