"""HTML report sink: per-experiment dashboard with loss curves and sample
images.

Counterpart of the reference HtmlReport (/root/reference/mdir/tools/
eventprocessor.py:464-666 + daan/presentation): at every close_epoch, render
`<dir>/epochs/htmlreport/index.html` with inline-SVG metric curves (no
matplotlib dependency on the training path) and thumbnails of the blob images.
"""
import html
import math
import os


def _finite(values):
    """NaN/inf metrics (events stores NaN for an all-NaN epoch) must not
    poison the axis range or emit 'nan' SVG points — skip them."""
    return [v for v in values if math.isfinite(v)]


def _points(series, lo, span, width, height):
    """Polyline points, skipping non-finite values (gaps in the line)."""
    return " ".join(
        "%.1f,%.1f" % (10 + x * (width - 20) / max(len(series) - 1, 1),
                       height - 15 - (v - lo) * (height - 30) / span)
        for x, v in enumerate(series) if math.isfinite(v))


def _svg_curve(series, width=420, height=140, color="#06c"):
    finite = _finite(series)
    if not finite:
        return ""
    lo, hi = min(finite), max(finite)
    span = (hi - lo) or 1.0
    pts = _points(series, lo, span, width, height)
    return (f'<svg width="{width}" height="{height}" '
            f'style="background:#fafafa;border:1px solid #ddd">'
            f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
            f'points="{pts}"/>'
            f'<text x="12" y="12" font-size="10">max {hi:.4g}</text>'
            f'<text x="12" y="{height - 4}" font-size="10">min {lo:.4g}</text>'
            f"</svg>")


_PALETTE = ("#06c", "#c30", "#293", "#a3c", "#c90", "#09a", "#666",
            "#e67", "#4bd", "#b52")


def _svg_multi_curve(series_map, width=420, height=140):
    """All series of one key group on a single chart with a legend (the
    reference's 'multiplot', eventprocessor.py:526-535 + plots.plot_multiline)."""
    allv = _finite(v for s in series_map.values() for v in s)
    if not allv:
        return ""
    lo, hi = min(allv), max(allv)
    span = (hi - lo) or 1.0
    parts = []
    for i, (name, series) in enumerate(sorted(series_map.items())):
        color = _PALETTE[i % len(_PALETTE)]
        pts = _points(series, lo, span, width, height)
        parts.append(f'<polyline fill="none" stroke="{color}" '
                     f'stroke-width="1.2" points="{pts}"/>')
        parts.append(f'<text x="{12 + (i % 3) * 136}" '
                     f'y="{12 + (i // 3) * 11}" font-size="9" '
                     f'fill="{color}">{html.escape(name)}</text>')
    return (f'<svg width="{width}" height="{height}" '
            f'style="background:#fafafa;border:1px solid #ddd">'
            + "".join(parts)
            + f'<text x="{width - 60}" y="{height - 4}" font-size="10">'
              f'{lo:.3g}..{hi:.3g}</text></svg>')


def _group_order(group):
    """Reference section ordering (eventprocessor.py:574)."""
    order = {"train/learning": 0, "val/learning": 1, "train/net": 3,
             "net": 4, "train/data": 5}
    return order.get(group, 2 if "learning" in group else 100)


class HtmlReport:
    """Sink with the streamer/sink interface of events.EventBroker."""

    def __init__(self, directory):
        self.directory = directory
        self.report_dir = os.path.join(directory, "epochs", "htmlreport")
        os.makedirs(self.report_dir, exist_ok=True)

    def register(self, *args, **kwargs):
        pass

    def close_epoch(self, epoch, history=None, metadata=None, histograms=None):
        if history is None:
            return
        keys = sorted({k for h in history for k in h["metrics"]})
        # group keys as the reference does (dirname = section; a group with
        # >1 series additionally gets ONE combined multi-series chart first —
        # the reference's loss 'multiplot', eventprocessor.py:526-535)
        # maps are keyed by the FULL metric key (a bare key 'x' and a nested
        # 'x/x' are distinct series and must not collide in one group slot)
        groups = {}
        for key in keys:
            group = key.rpartition("/")[0] or key
            groups.setdefault(group, {})[key] = \
                [h["metrics"][key] for h in history if key in h["metrics"]]
        rows = []
        for group in sorted(groups, key=lambda g: (_group_order(g), g)):
            series_map = groups[group]
            if len(series_map) > 1:
                rows.append(
                    f"<div class='metric'><h3>{html.escape(group)}/* "
                    f"<small>combined</small></h3>"
                    f"{_svg_multi_curve(series_map)}</div>")
            for key in sorted(series_map):
                series = series_map[key]
                rows.append(
                    f"<div class='metric'><h3>{html.escape(key)} "
                    f"<small>last {series[-1]:.5g}</small></h3>"
                    f"{_svg_curve(series)}</div>")

        # samples grouped per key with per-epoch captions (the reference
        # renders "Epoch N" blocks per blob key, eventprocessor.py:595-620);
        # per key the latest 6 epochs are shown
        blob_dir = os.path.join(self.directory, "epochs", "blobs")
        thumbs = ""
        if os.path.isdir(blob_dir):
            groups = {}
            for n in sorted(os.listdir(blob_dir)):
                if not n.lower().endswith((".jpg", ".png", ".txt")):
                    continue
                key, sep, ep = n.rsplit(".", 1)[0].rpartition("_epoch_")
                if not sep:  # free-form blob name: its own group, full label
                    key, ep = n, n
                groups.setdefault(key, []).append((ep, n))
            # numeric epoch order — lexicographic puts epoch 100 between
            # 10 and 11 and hides the FINAL epoch from [-6:]
            for items in groups.values():
                items.sort(key=lambda t: (int(t[0]) if t[0].isdigit()
                                          else -1, t[0]))

            def _fig(ep, n):
                cap = html.escape("epoch " + ep if ep != n else n)
                if n.lower().endswith(".txt"):  # text blob -> link (the
                    # reference renders .txt blobs as link divs,
                    # eventprocessor.py:607-609)
                    return (f"<figure><a href='../blobs/{html.escape(n)}'>"
                            f"txt</a><figcaption>{cap}</figcaption></figure>")
                return (f"<figure><img src='../blobs/{html.escape(n)}' "
                        f"width='128'><figcaption>{cap}</figcaption></figure>")

            blocks = []
            for key in sorted(groups):
                figs = "".join(_fig(ep, n) for ep, n in groups[key][-6:])
                blocks.append(f"<div class='metric'><h3>{html.escape(key)}"
                              f"</h3>{figs}</div>")
            thumbs = "".join(blocks)

        # per-epoch weight/grad distributions (reference renders histogram
        # sections per key, eventprocessor.py:640-654); the latest epoch's
        # SVG is inlined, older epochs stay reachable under blobs/
        dists = ""
        if histograms:
            from gandtr_tpu.learning.events import (_svg_histogram,
                                                    _svg_percentile_fan)
            blocks = []
            for key in sorted(histograms):
                epochs = histograms[key]
                if not epochs:
                    continue
                last = max(epochs)
                # 2+ epochs: percentile fan over epochs (reference
                # plots.plot_distribution); single epoch: plain histogram
                svg = (_svg_percentile_fan(epochs) if len(epochs) > 1
                       else _svg_histogram(epochs[last]))
                blocks.append(
                    f"<div class='metric'><h3>{html.escape(key)} "
                    f"<small>epoch {last} ({len(epochs)} epochs)</small></h3>"
                    + svg + "</div>")
            if blocks:
                dists = "<h2>Distributions</h2>" + "".join(blocks)

        doc = f"""<!doctype html><html><head><meta charset="utf-8">
<title>gandtr-tpu report</title>
<style>body{{font-family:sans-serif;margin:20px}}
.metric{{display:inline-block;margin:8px;vertical-align:top}}
figure{{display:inline-block;margin:4px;text-align:center}}
figcaption{{font-size:9px;max-width:128px;overflow:hidden}}</style></head>
<body><h1>Experiment report — epoch {epoch}</h1>
<h2>Metrics</h2>{''.join(rows)}
{dists}
<h2>Samples</h2>{thumbs}
</body></html>"""
        with open(os.path.join(self.report_dir, "index.html"), "w") as f:
            f.write(doc)
