"""Observability parity: weight/grad histograms + heatmap rendering.

Reference renders per-epoch weight histograms and heatmaps into its report
(/root/reference/mdir/tools/eventprocessor.py:176-328, 640-654). Our broker
reduces weight/* events to 200-bin histograms on arrival, writes per-epoch
SVG histogram blobs + colormapped heatmap PNGs, inlines a Distributions
section in the HTML report, and carries histograms through state_dict resume.
"""
import os

import numpy as np
import pytest

from gandtr_tpu.learning.events import (EventBroker, compute_histogram,
                                        _colormap, initialize_processor)


class TestHistogramEvents:
    def test_weight_event_reduced_and_stored(self, tmp_path):
        broker = EventBroker(directory=str(tmp_path))
        rng = np.random.RandomState(0)
        log = broker.logger("train/weights", epoch=1)
        log("generator/params", {"conv.kernel": rng.randn(64, 9),
                                 "conv.bias": rng.randn(64)}, "weight/param")
        log("generator/grads", rng.randn(100), "weight/grad")
        broker.close_epoch(1)

        hists = broker.histograms["train/weights/generator/params"][1]
        assert set(hists) == {"conv.kernel", "conv.bias"}
        centers, counts = hists["conv.kernel"]
        assert len(centers) == 200 and counts.sum() == 64 * 9
        # blob SVGs written per histogram key
        blobs = os.listdir(tmp_path / "epochs" / "blobs")
        assert "train_weights_generator_params_epoch_01.svg" in blobs
        assert "train_weights_generator_grads_epoch_01.svg" in blobs
        svg = (tmp_path / "epochs" / "blobs" /
               "train_weights_generator_params_epoch_01.svg").read_text()
        assert svg.startswith("<svg") and "conv.kernel" in svg

    def test_histogram_matches_reference_generate_hist(self):
        """Same (centers, counts) as eventprocessor.py:246-252."""
        rng = np.random.RandomState(3)
        v = rng.randn(500)
        centers, counts = compute_histogram(v)
        ref_counts, ref_edges = np.histogram(v, bins=200, density=False)
        np.testing.assert_allclose(centers,
                                   (ref_edges[:-1] + ref_edges[1:]) / 2)
        np.testing.assert_array_equal(counts, ref_counts)

    def test_state_dict_roundtrip(self, tmp_path):
        broker = EventBroker(directory=str(tmp_path))
        log = broker.logger("w", epoch=2)
        log("net/params", np.arange(10.0), "weight/param")
        broker.close_epoch(2)
        state = broker.state_dict()

        other = EventBroker()
        other.load_state_dict(state)
        a = broker.histograms["w/net/params"][2]["values"]
        b = other.histograms["w/net/params"][2]["values"]
        np.testing.assert_allclose(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


class TestHeatmapEvents:
    def test_heatmap_rendered_png(self, tmp_path):
        broker = EventBroker(directory=str(tmp_path))
        log = broker.logger("val/visual", epoch=3)
        hm = np.linspace(0, 1, 64).reshape(8, 8)
        log("attention", hm, "heatmap")
        log("loss_map", {"pix": hm}, "heatmap")
        blobs = os.listdir(tmp_path / "epochs" / "blobs")
        assert "val_visual_attention_epoch_03.png" in blobs
        assert "val_visual_loss_map_pix_epoch_03.png" in blobs
        from PIL import Image
        img = np.asarray(Image.open(
            tmp_path / "epochs" / "blobs" / "val_visual_attention_epoch_03.png"))
        assert img.shape == (8, 8, 3)

    def test_colormaps(self):
        v = np.array([[0.0, 0.5, 1.0]])
        reds = _colormap(v, "reds")
        cw = _colormap(v, "coolwarm")
        # reds: light -> dark red; coolwarm: blue -> neutral -> red
        assert reds[0, 0].sum() > reds[0, 2].sum()
        assert cw[0, 0, 2] > cw[0, 0, 0]  # blue end
        assert cw[0, 2, 0] > cw[0, 2, 2]  # red end
        assert _colormap(np.array([[2.0]]), "reds").shape == (1, 1, 3)


class TestReportSections:
    def test_training_loop_emits_histograms_and_report(self, tmp_path):
        """End-to-end: the Training driver logs weight/param dict events; the
        report gains a Distributions section with the subnet's params."""
        from gandtr_tpu.learning.training import Training

        class FakeState:
            variables = {"gen": {"params": {"conv": {
                "kernel": np.random.RandomState(0).randn(4, 4)}}}}

        class Loader(list):
            dataset = object()

        def step_fn(state, batch):
            return state, {"total": float(np.sum(batch))}

        broker = initialize_processor({"htmlreport": {}},
                                      directory=str(tmp_path))
        training = Training(step_fn=step_fn,
                            loader=Loader([(np.ones(2),), (np.zeros(2),)]),
                            epochs=2, events=broker)
        training.run(FakeState())

        assert broker.histograms["train/weights/gen/params"]
        report = (tmp_path / "epochs" / "htmlreport" / "index.html").read_text()
        assert "Distributions" in report
        assert "train/weights/gen/params" in report
        assert "conv.kernel" in report

    def test_scalar_time_distribution_histogram(self, tmp_path):
        """Per-iteration scalar/time values become a distribution histogram
        at close_epoch (reference eventprocessor.py:640-654)."""
        broker = EventBroker(directory=str(tmp_path))
        log = broker.logger("train/learning", 1, epoch_size=10)
        for it in range(10):
            log("time_data", 0.1 + 0.01 * it, "scalar/time", iteration=it)
        agg = broker.close_epoch(1)
        assert abs(agg["train/learning/time_data"] - sum(
            0.1 + 0.01 * i for i in range(10))) < 1e-9  # sum aggregation
        hists = broker.histograms["train/learning/time_data"][1]
        centers, counts = hists["iterations"]
        assert counts.sum() == 10

class TestPercentileFan:
    def test_hist_percentiles(self):
        from gandtr_tpu.learning.events import _hist_percentiles
        # uniform histogram over [0, 199]: median at ~center, extremes at ends
        centers = np.arange(200, dtype=float)
        counts = np.ones(200)
        qs = _hist_percentiles(centers, counts)
        assert qs[0] == 0.0 and qs[-1] == 199.0
        assert abs(qs[4] - 99.0) <= 1.0  # median
        assert qs == sorted(qs)  # monotone
        # empty histogram degrades to zeros
        assert _hist_percentiles(centers, np.zeros(200)) == [0.0] * 9

    def test_fan_svg_over_epochs(self):
        """>=2 epochs of histograms render nested percentile bands + a median
        line per subkey (reference plots.plot_distribution semantics)."""
        from gandtr_tpu.learning.events import (_svg_percentile_fan,
                                                compute_histogram)
        rng = np.random.RandomState(0)
        epochs = {e: {"conv.kernel": compute_histogram(rng.randn(500) * e)}
                  for e in (1, 2, 3)}
        svg = _svg_percentile_fan(epochs)
        assert svg.count("<polygon") == 4  # nested bands (0,8),(1,7),(2,6),(3,5)
        assert svg.count("<polyline") == 1  # bold median
        assert "conv.kernel" in svg

    def test_report_uses_fan_for_multi_epoch(self, tmp_path):
        from gandtr_tpu.learning.html_report import HtmlReport
        from gandtr_tpu.learning.events import compute_histogram
        rng = np.random.RandomState(1)
        report = HtmlReport(str(tmp_path))
        history = [{"epoch": e, "metrics": {"loss": 1.0 / e}} for e in (1, 2)]
        hists = {"w/params": {e: {"k": compute_histogram(rng.randn(100))}
                              for e in (1, 2)}}
        report.close_epoch(2, history=history, histograms=hists)
        html_text = (tmp_path / "epochs" / "htmlreport" / "index.html").read_text()
        assert "polygon" in html_text  # fan, not plain histogram
        assert "Distributions" in html_text

class TestReportCurveRobustness:
    def test_nan_metric_does_not_blank_group_chart(self, tmp_path):
        """A single NaN epoch (events stores NaN for an all-NaN epoch) must
        not poison the combined multi-series chart's axis range."""
        from gandtr_tpu.learning.html_report import (_svg_curve,
                                                     _svg_multi_curve,
                                                     HtmlReport)
        svg = _svg_multi_curve({"a": [1.0, float("nan"), 2.0],
                                "b": [3.0, 4.0, 5.0]})
        assert "nan" not in svg and svg.count("polyline") == 2
        assert "nan" not in _svg_curve([1.0, float("nan"), 3.0])
        assert _svg_curve([float("nan")]) == ""  # nothing plottable
        # end-to-end: report still renders the healthy series
        report = HtmlReport(str(tmp_path))
        history = [{"epoch": 1, "metrics": {"g/a": float("nan"), "g/b": 2.0}},
                   {"epoch": 2, "metrics": {"g/a": 1.0, "g/b": 3.0}}]
        report.close_epoch(2, history=history)
        text = (tmp_path / "epochs" / "htmlreport" / "index.html").read_text()
        assert "g/b" in text and "nan," not in text

    def test_bare_and_nested_same_name_keys_stay_distinct(self, tmp_path):
        """'x' and 'x/x' are different metrics — grouping by dirname must
        not collapse them into one slot (one would overwrite the other)."""
        from gandtr_tpu.learning.html_report import HtmlReport
        report = HtmlReport(str(tmp_path))
        history = [{"epoch": 1, "metrics": {"gan": 1.0, "gan/gan": 2.0,
                                            "gan/other": 5.0}},
                   {"epoch": 2, "metrics": {"gan": 3.0, "gan/gan": 4.0,
                                            "gan/other": 6.0}}]
        report.close_epoch(2, history=history)
        text = (tmp_path / "epochs" / "htmlreport" / "index.html").read_text()
        for last in ("last 3", "last 4", "last 6"):  # all three series render
            assert last in text, last


class TestTextBlobs:
    def test_text_blob_saved_and_reported(self, tmp_path):
        """String blob values become .txt files (reference 'text' dtype,
        supervised_epoch.py:119-121) and the report links them."""
        from gandtr_tpu.learning.html_report import HtmlReport
        broker = EventBroker(directory=str(tmp_path))
        log = broker.logger("data", 1)
        log("sample/labels", "[1, 2, 3]", "blob")
        txt = tmp_path / "epochs" / "blobs" / "data_sample_labels_epoch_01.txt"
        assert txt.read_text() == "[1, 2, 3]"
        rep = HtmlReport(str(tmp_path))
        rep.close_epoch(1, history=[{"metrics": {"loss": 1.0}}])
        doc = (tmp_path / "epochs" / "htmlreport" / "index.html").read_text()
        assert "data_sample_labels_epoch_01.txt" in doc and ">txt</a>" in doc

    def test_dict_debug_entry_logged_as_text(self, tmp_path):
        from gandtr_tpu.learning.training import Training

        class S:
            variables = {}
        t = Training(step_fn=lambda s, b: (s, {}), loader=[], epochs=1,
                     events=EventBroker(directory=str(tmp_path)))
        t._log_traindata_sample({"meta": {"labels": np.array([1, 2])}}, 1)
        txt = tmp_path / "epochs" / "blobs" / "data_meta_labels_epoch_01.txt"
        assert txt.read_text() == "[1, 2]"

class TestReviewFixes:
    def test_blob_epoch_tag_none_and_large(self, tmp_path):
        """epoch=None (validate stage) must not crash blob saving; epoch 100
        formats plainly."""
        broker = EventBroker(directory=str(tmp_path))
        broker.logger("val", None)("x", np.zeros((8, 8, 3)), "blob")
        broker.logger("val", 100)("x", np.zeros((8, 8, 3)), "blob")
        blobs = sorted(os.listdir(tmp_path / "epochs" / "blobs"))
        assert "val_x_epoch_val.jpg" in blobs and "val_x_epoch_100.jpg" in blobs

    def test_report_numeric_epoch_order(self, tmp_path):
        """Epoch 100 must appear in the last-6 window (lexicographic order
        would bury it between 10 and 11)."""
        from PIL import Image
        from gandtr_tpu.learning.html_report import HtmlReport
        blob_dir = tmp_path / "epochs" / "blobs"
        blob_dir.mkdir(parents=True)
        for e in list(range(1, 12)) + [100]:
            Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
                blob_dir / ("k_epoch_%02d.jpg" % e))
        rep = HtmlReport(str(tmp_path))
        rep.close_epoch(100, history=[{"metrics": {"l": 1.0}}])
        doc = (tmp_path / "epochs" / "htmlreport" / "index.html").read_text()
        assert "k_epoch_100.jpg" in doc
        assert "epoch 100" in doc

    def test_traindata_gate_skips_mismatched_channels(self, tmp_path):
        """Reference supervised_epoch.py:130-134: a 4-channel sample under a
        3-channel mean_std is NOT logged."""
        from gandtr_tpu.learning.training import Training
        broker = EventBroker(directory=str(tmp_path))
        t = Training(step_fn=lambda s, b: (s, {}), loader=[], epochs=1,
                     events=broker)
        t._log_traindata_sample({"x": np.zeros((32, 32, 4))}, 1)
        assert not os.listdir(tmp_path / "epochs" / "blobs")

    def test_visual_validation_mixed_shapes(self, tmp_path):
        """Aspect-preserving downscale yields mixed val shapes; the validation
        forwards per-image instead of dying in jnp.stack."""
        import jax.numpy as jnp
        import flax.linen as nn
        from gandtr_tpu.learning.training import VisualValidation

        class Identity(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                return x

        broker = EventBroker(directory=str(tmp_path))
        imgs = [jnp.zeros((24, 32, 3)), jnp.zeros((32, 24, 3))]
        vv = VisualValidation(Identity(), imgs, names=["a.jpg", "b.jpg"])

        class S:
            variables = {"generator_X": {}}
        vv(S(), 1, broker)
        blobs = sorted(os.listdir(tmp_path / "epochs" / "blobs"))
        assert "val_visual_a_epoch_01.jpg" in blobs
        assert "val_visual_b_epoch_01.jpg" in blobs


class TestInitializeProcessorConfig:
    """Reference-style processor config forms (eventprocessor.py:692-699,760):
    scalar params, unknown-name KeyError, broker `type` key."""

    def test_scalar_progress_form(self, capsys):
        broker = initialize_processor({"progress": 2})
        printer = broker.streamers[0]
        assert printer.print_each == 2
        # print_each_val defaults to print_each (eventprocessor.py:363-365)
        assert printer.print_each_val == 2

    def test_null_progress_disables_printing(self, capsys):
        """`progress:` left empty in YAML (None): the reference's
        DebugPrinter(None) never prints (eventprocessor.py:372) — must not
        TypeError on int(None) at build time nor on register."""
        broker = initialize_processor({"progress": None})
        printer = broker.streamers[0]
        printer.register(0, 0, 4, "train/learning/total", 1.0, "scalar")
        printer.register(0, 3, 4, "train/learning/total", 1.0, "scalar")
        assert capsys.readouterr().err == ""

    def test_unknown_processor_raises(self):
        with pytest.raises(KeyError, match="bogus"):
            initialize_processor({"bogus": {}})

    def test_type_key(self):
        assert initialize_processor({"type": "EventBroker"}) is not None
        with pytest.raises(KeyError, match="Other"):
            initialize_processor({"type": "Other"})

    def test_profile_key_passes(self):
        assert initialize_processor({"profile": "/tmp/x"}) is not None
