"""Event processing: metrics funnel, progress printing, metadata keeping.

Compact re-implementation of the reference event-processor core
(/root/reference/mdir/tools/eventprocessor.py): every loop emits
`(epoch, iteration, epoch_size, key, value, dtype)` through a logger closure;
streamers act live (stderr progress), accumulators aggregate per epoch, and the
MetadataKeeper drives best-epoch selection via a decisive criterion. Blob-type
events (sample images) are written under `<dir>/epochs/blobs/`.

dtype taxonomy (eventprocessor.py:20-27): "scalar/loss", "scalar/score",
"scalar/time", "weight/param", "weight/grad", "blob", "heatmap".
"""
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np


class MetadataKeeper:
    """Per-key epoch series with decisive-criterion best-epoch logic,
    reference-faithful (eventprocessor.py:117-153):

    - direction comes from the metric's DTYPE: "scalar/score" means higher is
      better (argmax), anything else (loss/time) lower is better (argmin);
    - the special criterion "epoch" marks every epoch best (the reference's
      GAN configs, _gan_eval.yml:2 — the best checkpoint tracks the last);
    - a criterion that was NOT updated at the latest closed epoch is never
      "last best" (validation frequency > 1 skips epochs);
    - on a tie with an earlier epoch, the LAST epoch still counts as best
      (`max(data) == data[-1]`, eventprocessor.py:131-134) while
      `best_epoch()` reports the FIRST best index (argmax/argmin).

    A `None` criterion (no validation configured at all) keeps our permissive
    default: every epoch is best, so `_best` tracks `_last`."""

    def __init__(self, decisive_criterion=None):
        self.decisive_criterion = decisive_criterion
        self.metrics = defaultdict(dict)  # key -> {epoch: value}
        self.dtypes = {}                  # key -> dtype
        self.epochs = []                  # closed epochs, in order

    def add(self, epoch, key, value, dtype="scalar/loss"):
        self.metrics[key][epoch] = value
        self.dtypes[key] = dtype

    def note_epoch(self, epoch):
        if not self.epochs or self.epochs[-1] != epoch:
            self.epochs.append(epoch)

    def series(self, key):
        d = self.metrics.get(key, {})
        return [d[e] for e in sorted(d)]

    def _higher_is_better(self, key):
        return self.dtypes.get(key) == "scalar/score"

    def best_epoch(self):
        key = self.decisive_criterion
        if key == "epoch":
            return self.epochs[-1] if self.epochs else None
        if not key or key not in self.metrics:
            return None
        d = self.metrics[key]
        es = sorted(d)
        vals = [d[e] for e in es]
        idx = int(np.argmax(vals)) if self._higher_is_better(key) \
            else int(np.argmin(vals))
        return es[idx]

    def is_last_best(self):
        key = self.decisive_criterion
        if key is None or key == "epoch":
            return True
        if key not in self.metrics:
            return False
        d = self.metrics[key]
        if self.epochs and max(d) != self.epochs[-1]:
            return False  # criterion skipped the latest epoch (frequency > 1)
        vals = [d[e] for e in sorted(d)]
        best = max(vals) if self._higher_is_better(key) else min(vals)
        return vals[-1] == best

    def state_dict(self):
        return {"metrics": {k: dict(v) for k, v in self.metrics.items()},
                "dtypes": dict(self.dtypes),
                "epochs": list(self.epochs),
                "decisive_criterion": self.decisive_criterion}

    def load_state_dict(self, state):
        self.decisive_criterion = state["decisive_criterion"]
        self.dtypes = dict(state.get("dtypes") or {})
        self.epochs = [int(e) for e in state.get("epochs") or []]
        self.metrics = defaultdict(dict)
        for k, v in state["metrics"].items():
            self.metrics[k] = {int(e): val for e, val in v.items()}


class DebugPrinter:
    """Stderr progress streamer (eventprocessor.py:361-401): running loss,
    s/batch, min/epoch."""

    def __init__(self, print_each=100, print_each_val=None):
        # falsy print_each disables printing; print_each_val defaults to
        # print_each (eventprocessor.py:363-365,372)
        self.print_each = print_each
        self.print_each_val = (print_each_val if print_each_val is not None
                               else print_each)
        self._start = None
        self._acc = defaultdict(list)

    def register(self, epoch, iteration, epoch_size, key, value, dtype):
        if not dtype.startswith("scalar") or not self.print_each:
            return
        if self._start is None:
            self._start = time.time()
        self._acc[key].append(float(value))
        if key.endswith("/total") and iteration is not None:
            # stage = first path segment, like the reference's
            # key.split("/", 1)[0].startswith("Val") (eventprocessor.py:375,389)
            each = self.print_each_val if key.split("/", 1)[0] == "val" \
                else self.print_each
            if (iteration + 1) % each == 0 or iteration + 1 == epoch_size:
                vals = self._acc[key]
                elapsed = time.time() - self._start
                sb = elapsed / max(len(vals), 1)
                print(f">> epoch {epoch} [{iteration + 1}/{epoch_size}] "
                      f"{key}: {np.mean(vals):.4f} ({sb:.2f}s/b, "
                      f"{sb * epoch_size / 60:.1f}min/epoch)", file=sys.stderr)

    def close_epoch(self, epoch):
        self._acc.clear()
        self._start = None


HISTOGRAM_BINS = 200  # eventprocessor.py:173


def compute_histogram(value, bins=HISTOGRAM_BINS):
    """Array -> (bin_centers, counts), the reference's _generate_hist
    (eventprocessor.py:246-252)."""
    v = np.asarray(value, np.float64).ravel()
    counts, edges = np.histogram(v, bins=bins, density=False)
    return (edges[:-1] + edges[1:]) / 2, counts


def _colormap(arr, cmap):
    """Minimal Reds / coolwarm colormaps (uint8 RGB) for heatmap rendering —
    no matplotlib on the training path (reference eventprocessor.py:228-244
    uses plt.imshow with vmin=0, vmax=1)."""
    v = np.clip(np.asarray(arr, np.float64), 0.0, 1.0)
    if cmap == "reds":
        anchors = np.array([[255, 245, 240], [252, 146, 114], [103, 0, 13]],
                           np.float64)
    else:  # coolwarm
        anchors = np.array([[59, 76, 192], [221, 221, 221], [180, 4, 38]],
                           np.float64)
    pos = v * (len(anchors) - 1)
    lo = np.clip(pos.astype(int), 0, len(anchors) - 2)
    frac = (pos - lo)[..., None]
    rgb = anchors[lo] * (1 - frac) + anchors[lo + 1] * frac
    return rgb.astype(np.uint8)


def _svg_histogram(hists, width=420, height=120):
    """{subkey: (centers, counts)} -> standalone SVG with one bar panel per
    subkey (dependency-free analog of eventprocessor.py:640-654)."""
    panels = []
    y0 = 0
    for subkey, (centers, counts) in hists.items():
        counts = np.asarray(counts, np.float64)
        peak = counts.max() or 1.0
        n = len(counts)
        bw = (width - 20) / n
        bars = "".join(
            '<rect x="%.1f" y="%.1f" width="%.2f" height="%.1f" fill="#579"/>'
            % (10 + i * bw, y0 + height - 14 - h, max(bw - 0.2, 0.3), h)
            for i, h in enumerate((counts / peak) * (height - 30)))
        label = ("%s  [%.3g, %.3g]" % (subkey, centers[0], centers[-1])
                 if len(centers) else subkey)
        panels.append(
            f'<g>{bars}<text x="12" y="{y0 + 12}" font-size="10">'
            f"{label}</text></g>")
        y0 += height
    return (f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{y0}" style="background:#fafafa">' + "".join(panels)
            + "</svg>")


#: reference plots.py:29 — percentile levels of the distribution fan
FAN_PERCENTILES = (0, 0.07, 0.16, 0.31, 0.5, 0.69, 0.84, 0.93, 1)


def _hist_percentiles(centers, counts, qs=FAN_PERCENTILES):
    """Percentile values of a (centers, counts) histogram via the CDF."""
    counts = np.asarray(counts, np.float64)
    total = counts.sum()
    if total == 0 or not len(counts):
        return [0.0] * len(qs)
    cum = np.cumsum(counts)
    idx = np.searchsorted(cum, np.asarray(qs) * total)
    return [float(centers[min(i, len(counts) - 1)]) for i in idx]


def _svg_percentile_fan(epochs_hists, width=420, height=120):
    """{epoch: {subkey: (centers, counts)}} -> SVG percentile fan over epochs
    per subkey: nested bands between symmetric percentile pairs plus a bold
    median line — the dependency-free analog of the reference's
    plot_distribution (plots.py:28-68, matplotlib fill_between)."""
    eps = sorted(epochs_hists)
    subkeys = sorted({s for e in eps for s in epochs_hists[e]})
    panels, y0 = [], 0
    band_fill = "rgb(255,165,115)"   # plots.py:30 CURVE1_COLOR
    line_col = "rgb(226,115,70)"     # plots.py:31 CURVE2_COLOR ("bold")
    for subkey in subkeys:
        series = []  # per epoch: percentile vector
        for e in eps:
            if subkey not in epochs_hists[e]:
                series.append(None)
                continue
            series.append(_hist_percentiles(*epochs_hists[e][subkey]))
        pts = [(i, p) for i, p in enumerate(series) if p is not None]
        if not pts:
            continue
        flat = [v for _, p in pts for v in p]
        lo, hi = min(flat), max(flat)
        span = (hi - lo) or 1.0
        nx = max(len(eps) - 1, 1)

        def xy(i, v):
            return ("%.1f,%.1f" % (10 + i * (width - 20) / nx,
                                   y0 + height - 14
                                   - (v - lo) * (height - 30) / span))

        shapes = []
        nq = len(FAN_PERCENTILES)
        for b in range(nq // 2):  # nested bands: (0,8),(1,7),(2,6),(3,5)
            top = " ".join(xy(i, p[nq - 1 - b]) for i, p in pts)
            bot = " ".join(xy(i, p[b]) for i, p in reversed(pts))
            shapes.append(f'<polygon points="{top} {bot}" fill="{band_fill}" '
                          f'fill-opacity="0.25" stroke="none"/>')
        median = " ".join(xy(i, p[nq // 2]) for i, p in pts)
        shapes.append(f'<polyline points="{median}" fill="none" '
                      f'stroke="{line_col}" stroke-width="1.5"/>')
        label = "%s  [%.3g, %.3g]" % (subkey, lo, hi)
        panels.append(f'<g>{"".join(shapes)}<text x="12" y="{y0 + 12}" '
                      f'font-size="10">{label}</text></g>')
        y0 += height
    return (f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{y0}" style="background:#fafafa">' + "".join(panels)
            + "</svg>")


class EventBroker:
    """Facade (eventprocessor.py:680-752): fan out live events to streamers,
    accumulate per-epoch aggregates, persist history as JSON. weight/* events
    are reduced to 200-bin histograms on arrival (arrays are not retained);
    heatmap events render to colormapped PNGs under blobs/."""

    AGGREGATIONS = {"scalar/loss": "avg", "scalar/score": "avg",
                    "scalar/time": "sum"}

    def __init__(self, directory=None, streamers=(), metadata=None, sinks=()):
        self.directory = directory
        self.streamers = list(streamers)
        self.sinks = list(sinks)
        self.metadata = metadata or MetadataKeeper()
        self.iter_keys = set()  # scalar keys logged with an iteration index
        self._epoch_acc = defaultdict(list)
        self._epoch_hists = {}
        self.histograms = defaultdict(dict)  # key -> {epoch: {subkey: hist}}
        self.history = []
        if directory:
            os.makedirs(os.path.join(directory, "epochs", "blobs"), exist_ok=True)

    def logger(self, prefix, epoch, epoch_size=None):
        """Returns register_data(key, value, dtype, iteration=None) closure —
        the shape train loops use (stages/train.py:30-43)."""
        def register(key, value, dtype="scalar/loss", iteration=None):
            self.register_data(epoch, iteration, epoch_size,
                               f"{prefix}/{key}" if prefix else key, value, dtype)
        return register

    def register_data(self, epoch, iteration, epoch_size, key, value, dtype):
        for s in self.streamers:
            s.register(epoch, iteration, epoch_size, key, value, dtype)
        if dtype.startswith("scalar"):
            if iteration is not None:
                self.iter_keys.add(key)
            self._epoch_acc[(key, dtype)].append(float(value))
        elif dtype.startswith("weight/"):
            data = value if isinstance(value, dict) else {"values": value}
            self._epoch_hists[key] = {
                sk: v if (isinstance(v, tuple) and len(v) == 2)
                else compute_histogram(v) for sk, v in data.items()}
        elif dtype == "heatmap":
            self._save_heatmap(epoch, key, value)
        elif dtype == "blob" and self.directory is not None:
            self._save_blob(epoch, key, value)

    @staticmethod
    def _epoch_tag(epoch):
        """'%02d' for ints; the validate stage passes epoch=None (validate
        once, outside training) which becomes 'val'."""
        if isinstance(epoch, (int, np.integer)):
            return "%02d" % epoch
        return "val" if epoch is None else str(epoch)

    def _save_blob(self, epoch, key, value):
        base = os.path.join(self.directory, "epochs", "blobs",
                            "%s_epoch_%s" % (key.replace("/", "_"),
                                             self._epoch_tag(epoch)))
        if isinstance(value, str):  # text blob (reference dtype "text",
            with open(base + ".txt", "w") as f:  # supervised_epoch.py:119-121)
                f.write(value)
            return
        from PIL import Image
        arr = np.asarray(value)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(base + ".jpg")

    def _save_heatmap(self, epoch, key, value):
        """Render 2-D maps in [0, 1] to colormapped PNGs (Reds for loss keys,
        coolwarm otherwise — eventprocessor.py:228-244)."""
        if self.directory is None:
            return
        from PIL import Image
        data = value if isinstance(value, dict) else {"": value}
        for subkey, arr in data.items():
            cmap = "reds" if ("loss" in key or "loss" in subkey) else "coolwarm"
            rgb = _colormap(arr, cmap)
            name = "_".join(x for x in (key.replace("/", "_"),
                                        subkey.replace("/", "_")) if x)
            path = os.path.join(self.directory, "epochs", "blobs",
                                "%s_epoch_%s.png" % (name,
                                                     self._epoch_tag(epoch)))
            Image.fromarray(rgb).save(path)

    def close_epoch(self, epoch):
        aggregated = {}
        for (key, dtype), values in self._epoch_acc.items():
            agg = self.AGGREGATIONS.get(dtype, "avg")
            # NaN iterations are dropped before aggregating, like the
            # reference (eventprocessor.py:106-108)
            vals = np.asarray(values, dtype=float)
            vals = vals[~np.isnan(vals)]
            aggregated[key] = float(np.sum(vals)) if agg == "sum" else (
                float(np.mean(vals)) if len(vals) else float("nan"))
            self.metadata.add(epoch, key, aggregated[key], dtype)
            # per-iteration scalar/time distributions render as histograms in
            # the reference report (eventprocessor.py:640-654); NaN iterations
            # drop first like the report path (:498) or np.histogram raises
            if dtype == "scalar/time" and len(vals) > 1:
                self._epoch_hists.setdefault(key, {})["iterations"] = \
                    compute_histogram(vals, bins=min(50, len(vals)))
        self._epoch_acc.clear()
        for key, hists in self._epoch_hists.items():
            self.histograms[key][epoch] = hists
            if self.directory:
                path = os.path.join(
                    self.directory, "epochs", "blobs",
                    "%s_epoch_%02d.svg" % (key.replace("/", "_"), epoch))
                with open(path, "w") as f:
                    f.write(_svg_histogram(hists))
        self._epoch_hists = {}
        self.metadata.note_epoch(epoch)
        for s in self.streamers:
            s.close_epoch(epoch)
        self.history.append({"epoch": epoch, "metrics": aggregated})
        if self.directory:
            with open(os.path.join(self.directory, "epochs", "events.json"), "w") as f:
                json.dump(self.history, f, indent=1)
        for sink in self.sinks:
            sink.close_epoch(epoch, history=self.history, metadata=self.metadata,
                             histograms=self.histograms)
        return aggregated

    def ref_metadata(self):
        """Per-epoch series under the REFERENCE's metadata() key forms
        (eventprocessor.py:84-92,119-120: `section:subkey` + aggregation
        suffix), for drop-in consumers of the reference's stage metadata.

        Losses are per-iteration streams in the reference (train AND
        validation batches), so every scalar/loss key gets the `loss:` label
        and `_avg.4`; scores keep their key and carry `_avg.4` only when
        they were iteration-logged here (per-query APs) — once-per-epoch
        score dicts aggregate as None (suffix '') in the reference."""
        out = {}
        for key, dtype in self.metadata.dtypes.items():
            if dtype not in ("scalar/loss", "scalar/score"):
                continue
            series = self.metadata.series(key)
            if dtype == "scalar/loss":
                if ":" in key.rsplit("/", 1)[-1]:
                    base = key
                else:
                    head, _, name = key.rpartition("/")
                    base = "%s/loss:%s" % (head, name) if head \
                        else "loss:%s" % name
                out[base + "_avg.4"] = series
            else:
                if key not in self.iter_keys:
                    # Once-per-epoch score dicts aggregate as None in the
                    # reference, so their ref-form key IS the original key
                    # (no suffix). Emitting it here would make
                    # _stage_metadata's metrics.update() replace the
                    # last-epoch flat scalar with a per-epoch list, breaking
                    # the flat-float metrics contract (advisor r4). The
                    # per-epoch series for these keys is already published
                    # under stage metadata's `metrics_series[key]`.
                    continue
                out[key + "_avg.4"] = series
        return out

    def state_dict(self):
        return {"history": self.history, "metadata": self.metadata.state_dict(),
                "iter_keys": sorted(self.iter_keys),
                "histograms": {
                    k: {e: {sk: (np.asarray(c).tolist(),
                                 np.asarray(n).tolist())
                            for sk, (c, n) in hs.items()}
                        for e, hs in v.items()}
                    for k, v in self.histograms.items()}}

    def load_state_dict(self, state):
        self.history = state["history"]
        self.iter_keys = set(state.get("iter_keys") or ())
        self.metadata.load_state_dict(state["metadata"])
        self.histograms = defaultdict(dict)
        for k, v in (state.get("histograms") or {}).items():
            for e, hs in v.items():
                self.histograms[k][int(e)] = {
                    sk: (np.asarray(c), np.asarray(n)) for sk, (c, n) in hs.items()}


def initialize_processor(params, directory=None, decisive_criterion=None):
    """Build an EventBroker from reference-style output config
    ({progress: {print_each: ...}, htmlreport: {}})."""
    params = dict(params or {})
    broker_type = params.pop("type", "EventBroker")  # eventprocessor.py:760
    if broker_type != "EventBroker":
        raise KeyError("Unsupported event broker type %r" % broker_type)
    params.pop("profile", None)  # our jax.profiler extension (training.py:98)
    streamers = []
    if "progress" in params:
        prog = params.pop("progress")
        if not isinstance(prog, dict):  # reference scalar form
            prog = {"print_each": prog}  # (eventprocessor.py:696-699)
        # None values pass through: DebugPrinter(None) is the reference's
        # "disabled" printer (eventprocessor.py:372), not an int
        streamers.append(DebugPrinter(**{
            k: (int(v) if v is not None else None) for k, v in prog.items()}))
    sinks = []
    if "htmlreport" in params and directory:
        from gandtr_tpu.learning.html_report import HtmlReport
        sinks.append(HtmlReport(directory))
    if "tensorboard" in params and directory:
        from gandtr_tpu.learning.tensorboard import TensorboardWriter
        streamers.append(TensorboardWriter(directory))
    params.pop("htmlreport", None)
    params.pop("tensorboard", None)
    if params:  # unknown processors KeyError in the reference (:692)
        raise KeyError("Unsupported event processors: %s" % sorted(params))
    keeper = MetadataKeeper(decisive_criterion)
    return EventBroker(directory=directory, streamers=streamers, metadata=keeper,
                       sinks=sinks)
