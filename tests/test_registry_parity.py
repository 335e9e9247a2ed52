"""Registry-parity audit vs the reference's string registries.

The reference's extension mechanism is a set of NAME→class dicts (SURVEY.md
§2: TRANSFORMS, WRAPPERS_LABELS, MODEL_LABELS, CRITERIA, ...). This test
AST-parses every one of those dict literals out of the mounted reference
sources and asserts each label has a resolvable equivalent here — so a future
reference-side label we missed (or a refactor that drops one of ours) fails
loudly instead of silently shrinking the parity surface.

Labels whose equivalent is a different *design* (not a same-named dict key)
are resolved through explicit equivalence maps below, each annotated with the
implementing symbol; the test asserts the symbol exists and is callable.
"""
import ast
import os

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")


def ref_dict_keys(relpath, name):
    """String keys of the dict literal assigned to `name` (top-level or
    class-level) in the reference file `relpath`."""
    with open(os.path.join(REF, relpath)) as fh:
        tree = ast.parse(fh.read())
    for node in ast.walk(tree):
        if not isinstance(node, ast.Assign) or not isinstance(node.value, ast.Dict):
            continue
        for t in node.targets:
            if isinstance(t, ast.Name) and t.id == name:
                return [k.value for k in node.value.keys
                        if isinstance(k, ast.Constant)]
    raise AssertionError("%s not found in %s" % (name, relpath))


def test_transform_labels_cover_reference():
    from gandtr_tpu.data.transforms import TRANSFORMS
    ref = ref_dict_keys("mdir/components/data/transform/__init__.py",
                        "TRANSFORMS")
    assert set(ref) <= set(TRANSFORMS), set(ref) - set(TRANSFORMS)


def test_wrapper_labels_cover_reference():
    from gandtr_tpu.learning.wrappers import WRAPPERS_LABELS
    ref = ref_dict_keys("mdir/components/data/wrapper.py", "WRAPPERS_LABELS")
    assert set(ref) <= set(WRAPPERS_LABELS), set(ref) - set(WRAPPERS_LABELS)


def test_dataset_labels_cover_reference():
    from gandtr_tpu.data.datasets import DATASET_LABELS
    ref = ref_dict_keys("mdir/components/data/dataset/__init__.py",
                        "DATASET_LABELS")
    assert set(ref) <= set(DATASET_LABELS), set(ref) - set(DATASET_LABELS)


def test_model_labels_cover_reference():
    from gandtr_tpu.models import MODEL_LABELS
    ref = ref_dict_keys("mdir/components/model/network/__init__.py",
                        "MODEL_LABELS")
    assert set(ref) <= set(MODEL_LABELS), set(ref) - set(MODEL_LABELS)


def test_criteria_cover_reference():
    from gandtr_tpu.learning.criteria import CRITERIA
    ref = ref_dict_keys("mdir/components/optim/criterion/__init__.py",
                        "CRITERIA")
    assert set(ref) <= set(CRITERIA), set(ref) - set(CRITERIA)


def test_groupings_cover_reference():
    from gandtr_tpu.models.grouping import GROUPINGS
    ref = ref_dict_keys("mdir/components/model/layers/grouping.py",
                        "GROUPINGS")
    assert set(ref) <= set(GROUPINGS), set(ref) - set(GROUPINGS)


def test_grouping_function_registries_cover_reference():
    import gandtr_tpu.models.grouping as g
    for ref_name, ours in [("feature_functions", g.FEATURE_FUNCTIONS),
                           ("nearest_params", g.NEAREST_PARAMS),
                           ("assignment_functions", g.ASSIGNMENT_FUNCTIONS),
                           ("descriptor_functions", g.DESCRIPTOR_FUNCTIONS),
                           ("weight_functions", g.WEIGHT_FUNCTIONS),
                           ("SIZE_SHORTCUTS", g.SIZE_SHORTCUTS)]:
        ref = ref_dict_keys("mdir/components/model/layers/grouping.py",
                            ref_name)
        assert set(ref) <= set(ours), (ref_name, set(ref) - set(ours))


def test_mdir_poolings_cover_reference():
    # POOLINGS = Horde + Weiszfeld (layers/pooling.py:98-101). Weiszfeld is a
    # dict-configured cirnet pooling override; Horde is a training
    # regularizer module (its forward returns a list — not consumable as a
    # pooling override by the reference's own CirRetrievalNet either).
    from gandtr_tpu.models import extra_layers, initialize_model
    ref = ref_dict_keys("mdir/components/model/layers/pooling.py", "POOLINGS")
    assert set(ref) == {"HordeCascadedKOrder", "GeometricMedianWeiszfeld"}
    assert callable(extra_layers.HordeCascadedKOrder)
    assert callable(extra_layers.geometric_median_weiszfeld)

    import jax
    import jax.numpy as jnp
    m = initialize_model({
        "architecture": "cirnet", "cir_architecture": "vgg16",
        "local_whitening": False, "whitening": False, "regional": False,
        "pooling": {"type": "GeometricMedianWeiszfeld", "iterations": 2,
                    "intermediate_gradients": False}})
    x = jnp.ones((1, 32, 32, 3))
    out = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (1, 512)
    assert float(jnp.linalg.norm(out)) == pytest.approx(1.0, rel=1e-4)


def test_cirtorch_poolings_cover_reference():
    from gandtr_tpu.ops.pooling import POOLINGS
    ref = ref_dict_keys("mdir/external/cirtorch/networks/imageretrievalnet.py",
                        "POOLING")
    # gemmp = gem with a per-channel p vector (GemRetrievalNet 'gemmp' branch)
    ours = set(POOLINGS) | {"gemmp"}
    assert set(ref) <= ours, set(ref) - ours


def test_weight_initializations_cover_reference():
    import jax
    import jax.numpy as jnp
    from gandtr_tpu.models.init import initialize_weights
    ref = ref_dict_keys("mdir/components/model/weight_initialization.py",
                        "WEIGHT_INITIALIZATIONS")
    params = {"conv": {"kernel": jnp.zeros((3, 3, 4, 8)),
                       "bias": jnp.zeros((8,))}}
    for scheme in ref:
        out = initialize_weights(params, jax.random.PRNGKey(0),
                                 weights=scheme)
        assert out["conv"]["kernel"].shape == (3, 3, 4, 8), scheme


def test_optimizers_and_schedulers_cover_reference():
    from gandtr_tpu.learning.optimizers import OPTIMIZERS
    from gandtr_tpu.learning.schedules import SCHEDULES
    ref_opt = ref_dict_keys(
        "mdir/components/optim/optimizer/base_optimizers.py",
        "BASE_OPTIMIZERS")
    ref_sched = ref_dict_keys(
        "mdir/components/optim/scheduler/base_schedulers.py",
        "BASE_SCHEDULERS")
    assert set(ref_opt) <= set(OPTIMIZERS), set(ref_opt) - set(OPTIMIZERS)
    assert set(ref_sched) <= set(SCHEDULES), set(ref_sched) - set(SCHEDULES)


def test_epoch_iterations_cover_reference():
    from gandtr_tpu.scenarios.build import EPOCH_ITERATION_FAMILIES
    ref = ref_dict_keys("mdir/learning/epoch_iteration/__init__.py",
                        "EPOCH_ITERATIONS")
    # SupervisedEpoch (fakebatch fine-tune) is dispatched by network type
    # (CirSequentialNetwork → finetune_build), not by iteration label
    covered = set(EPOCH_ITERATION_FAMILIES) | {"SupervisedEpoch"}
    assert set(ref) <= covered, set(ref) - covered


def test_network_containers_cover_reference():
    # NETWORKS (network.py:907-918) → functional equivalents. The mutable
    # container hierarchy became pure modules + builder functions; this map
    # is the documented correspondence.
    import gandtr_tpu.learning.network as net
    from gandtr_tpu.scenarios import train_stage, finetune_build
    ref = ref_dict_keys("mdir/learning/network.py", "NETWORKS")
    equivalents = {
        "SingleNetwork": net.build_single_net,
        "SingleNetworkLink": net.build_model_set,  # resolved inside ModelSet
        "CirNetwork": net.build_single_net,        # deprecated alias in ref
        "GlobalLocalNetwork": net.GlobalLocalModule,
        "MultiNetwork": net.ModelSet,
        "NetworkSet": net.build_model_set,
        "SequentialNetwork": finetune_build.build_finetune_experiment,
        "CirSequentialNetwork": finetune_build.build_finetune_experiment,
        "MultiheadNetwork": net.MultiheadModule,
    }
    for label in ref:
        assert label in equivalents, label
        assert callable(equivalents[label]), label
    # the type strings appearing in actual scenario YAMLs must dispatch
    assert callable(train_stage.train)


def test_learning_runtime_types_cover_reference():
    import gandtr_tpu.learning.training as tr
    for relpath, name in [("mdir/learning/training.py", "TRAININGS"),
                          ("mdir/learning/learning.py", "LEARNINGS"),
                          ("mdir/learning/validation.py", "VALIDATIONS")]:
        ref = ref_dict_keys(relpath, name)
        equivalents = {
            "EpochTraining": tr.Training,
            "TrainValLearning": tr.Training,
            "SingleValidation": tr.LossValidation,
            "MultiCriterialValidation": tr.MultiCriterialValidation,
        }
        for label in ref:
            assert label in equivalents and callable(equivalents[label]), label


def test_scores_cover_reference():
    import gandtr_tpu.learning.training as tr
    ref = ref_dict_keys("mdir/components/optim/score/__init__.py", "SCORES")
    equivalents = {"cirdatasetap": tr.ScoreValidation,
                   "visual": tr.VisualValidation}
    for label in ref:
        assert label in equivalents and callable(equivalents[label]), label


def test_output_labels_cover_reference():
    from gandtr_tpu.scenarios import infer_stage
    ref = ref_dict_keys("mdir/components/data/output.py", "OUTPUT_LABELS")
    equivalents = {"rgb": infer_stage.RgbImageSaver,
                   "embedding": infer_stage.EmbeddingOutput}
    for label in ref:
        assert label in equivalents and callable(equivalents[label]), label


def test_event_processors_cover_reference(tmp_path):
    from gandtr_tpu.learning.events import initialize_processor
    ref = ref_dict_keys("mdir/tools/eventprocessor.py", "EVENTPROCESSORS")
    cfg = {label: {} for label in ref}
    broker = initialize_processor(cfg, directory=str(tmp_path))
    assert broker is not None


def test_hub_entrypoints_cover_reference():
    import gandtr_tpu.hub as hub
    with open(os.path.join(REF, "hubconf.py")) as fh:
        tree = ast.parse(fh.read())
    names = []
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module == "mdir.hub.model":
            names += [a.name for a in node.names]
    assert len(names) == 6, names
    for name in names:
        assert callable(getattr(hub, name)), name


def test_scenario_functions_cover_reference():
    from gandtr_tpu.scenarios.run import FUNCTIONS
    ref = ref_dict_keys("mdir/examples/perform_scenario.py", "FUNCTIONS")
    assert set(ref) <= set(FUNCTIONS), set(ref) - set(FUNCTIONS)


def test_caffe_backbone_tables_cover_reference():
    from gandtr_tpu.models import pretrained_urls, backbones
    for table in ["FEATURES", "L_WHITENING", "R_WHITENING", "WHITENING"]:
        ref = ref_dict_keys(
            "mdir/external/cirtorch/networks/imageretrievalnet.py", table)
        ours = getattr(pretrained_urls, table)
        assert set(ref) <= set(ours), (table, set(ref) - set(ours))
    # output dims for every caffe-weight backbone the reference ships
    ref_feats = ref_dict_keys(
        "mdir/external/cirtorch/networks/imageretrievalnet.py", "FEATURES")
    for arch in ref_feats:
        assert arch in backbones.OUTPUT_DIM, arch
