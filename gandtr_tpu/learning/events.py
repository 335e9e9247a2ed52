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
    """Per-key epoch series with avg/sum aggregation and decisive-criterion
    best-epoch logic (eventprocessor.py:117-153)."""

    def __init__(self, decisive_criterion=None, decisive_should_decrease=False):
        self.decisive_criterion = decisive_criterion
        self.decisive_should_decrease = decisive_should_decrease
        self.metrics = defaultdict(dict)  # key -> {epoch: value}

    def add(self, epoch, key, value):
        self.metrics[key][epoch] = value

    def series(self, key):
        d = self.metrics.get(key, {})
        return [d[e] for e in sorted(d)]

    def best_epoch(self):
        key = self.decisive_criterion
        if not key or key not in self.metrics:
            return None
        d = self.metrics[key]
        cmp = min if self.decisive_should_decrease else max
        return cmp(d, key=lambda e: d[e])

    def is_last_best(self):
        key = self.decisive_criterion
        if not key or key not in self.metrics:
            return True
        last = max(self.metrics[key])
        return self.best_epoch() == last

    def state_dict(self):
        return {"metrics": {k: dict(v) for k, v in self.metrics.items()},
                "decisive_criterion": self.decisive_criterion,
                "decisive_should_decrease": self.decisive_should_decrease}

    def load_state_dict(self, state):
        self.decisive_criterion = state["decisive_criterion"]
        self.decisive_should_decrease = state["decisive_should_decrease"]
        self.metrics = defaultdict(dict)
        for k, v in state["metrics"].items():
            self.metrics[k] = {int(e): val for e, val in v.items()}


class DebugPrinter:
    """Stderr progress streamer (eventprocessor.py:361-401): running loss,
    s/batch, min/epoch."""

    def __init__(self, print_each=100, print_each_val=1000):
        self.print_each = print_each
        self.print_each_val = print_each_val
        self._start = None
        self._acc = defaultdict(list)

    def register(self, epoch, iteration, epoch_size, key, value, dtype):
        if not dtype.startswith("scalar"):
            return
        if self._start is None:
            self._start = time.time()
        self._acc[key].append(float(value))
        if key.endswith("/total") and iteration is not None:
            each = self.print_each_val if "/val" in key else self.print_each
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


class EventBroker:
    """Facade (eventprocessor.py:680-752): fan out live events to streamers,
    accumulate per-epoch aggregates, persist history as JSON."""

    AGGREGATIONS = {"scalar/loss": "avg", "scalar/score": "avg",
                    "scalar/time": "sum"}

    def __init__(self, directory=None, streamers=(), metadata=None, sinks=()):
        self.directory = directory
        self.streamers = list(streamers)
        self.sinks = list(sinks)
        self.metadata = metadata or MetadataKeeper()
        self._epoch_acc = defaultdict(list)
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
            self._epoch_acc[(key, dtype)].append(float(value))
        elif dtype == "blob" and self.directory is not None:
            self._save_blob(epoch, key, value)

    def _save_blob(self, epoch, key, value):
        from PIL import Image
        path = os.path.join(self.directory, "epochs", "blobs",
                            "%s_epoch_%02d.jpg" % (key.replace("/", "_"), epoch))
        arr = np.asarray(value)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(path)

    def close_epoch(self, epoch):
        aggregated = {}
        for (key, dtype), values in self._epoch_acc.items():
            agg = self.AGGREGATIONS.get(dtype, "avg")
            aggregated[key] = float(np.sum(values) if agg == "sum" else np.mean(values))
            self.metadata.add(epoch, key, aggregated[key])
        self._epoch_acc.clear()
        for s in self.streamers:
            s.close_epoch(epoch)
        self.history.append({"epoch": epoch, "metrics": aggregated})
        if self.directory:
            with open(os.path.join(self.directory, "epochs", "events.json"), "w") as f:
                json.dump(self.history, f, indent=1)
        for sink in self.sinks:
            sink.close_epoch(epoch, history=self.history, metadata=self.metadata)
        return aggregated

    def state_dict(self):
        return {"history": self.history, "metadata": self.metadata.state_dict()}

    def load_state_dict(self, state):
        self.history = state["history"]
        self.metadata.load_state_dict(state["metadata"])


def initialize_processor(params, directory=None, decisive_criterion=None,
                         decisive_should_decrease=False):
    """Build an EventBroker from reference-style output config
    ({progress: {print_each: ...}, htmlreport: {}})."""
    params = dict(params or {})
    streamers = []
    if "progress" in params:
        streamers.append(DebugPrinter(**{
            k: int(v) for k, v in (params.pop("progress") or {}).items()}))
    sinks = []
    if "htmlreport" in params and directory:
        from gandtr_tpu.learning.html_report import HtmlReport
        sinks.append(HtmlReport(directory))
    if "tensorboard" in params and directory:
        from gandtr_tpu.learning.tensorboard import TensorboardWriter
        streamers.append(TensorboardWriter(directory))
    params.pop("htmlreport", None)
    params.pop("tensorboard", None)
    keeper = MetadataKeeper(decisive_criterion, decisive_should_decrease)
    return EventBroker(directory=directory, streamers=streamers, metadata=keeper,
                       sinks=sinks)
