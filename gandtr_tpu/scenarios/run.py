"""Scenario CLI — counterpart of the reference's perform_scenario.py
(/root/reference/mdir/examples/perform_scenario.py): load + overlay YAML
scenarios, list/validate targets, run sorted steps threading
`${step._output_metadata}` context between them.

Usage: python -m gandtr_tpu.scenarios.run <target|list|validate> scenario.yml
       [overlay.yml ...] [section.key=value ...]
"""
import argparse
import copy
import io
import os
import sys

from gandtr_tpu.scenarios.engine import load_yaml_scenario, resolve_variables
from gandtr_tpu.scenarios import stages as stage_mod


def print_scores(parameters, _data):
    scores = {
        "roxford5k/validation/score_avg:map_medium": "roxford.5k medium",
        "rparis6k/validation/score_avg:map_medium": "rparis.6k medium",
        "247tokyo1k/validation/score_avg:map": "247tokyo.1k",
        "val/validation/roxford5k/score_avg:map_medium": "roxford.5k medium",
        "val/validation/rparis6k/score_avg:map_medium": "rparis.6k medium",
    }
    assert parameters.keys() == {"metadata"}, parameters.keys()
    for heading, section in parameters["metadata"].items():
        print("\n%s\n" % heading.capitalize())
        for key, value in section.items():
            if key in scores:
                print("    %-20s %s" % (scores[key], round(100 * value, 2)))
        print()
    return ({},)


def _download(fn_name):
    def stage(_params, _data):
        from gandtr_tpu.utils import download as dl
        from gandtr_tpu.utils.io import resolve_path
        root = resolve_path("data") or "data"
        root = root[:-len("/data")] if root.endswith("/data") else "."
        getattr(dl, fn_name)(os.path.join(root, "data"))
        return ({},)
    return stage


def _lazy_train(params, data):
    from gandtr_tpu.scenarios.train_stage import train
    return train(params, data)


def _lazy_infer(params, data):
    from gandtr_tpu.scenarios.infer_stage import infer
    return infer(params, data)


def _lazy_validate(params, data):
    from gandtr_tpu.scenarios.validate_stage import validate
    return validate(params, data)


def _lazy_infer_incrementally(params, data):
    from gandtr_tpu.scenarios.infer_stage import infer_incrementally
    return infer_incrementally(params, data)


def _lazy_export(params, data):
    from gandtr_tpu.scenarios.export_stage import export
    return export(params, data)


def _lazy_build_index(params, data):
    from gandtr_tpu.scenarios.index_stage import build_index
    return build_index(params, data)


FUNCTIONS = {
    # our names
    "gandtr_tpu.stages.train": _lazy_train,
    "gandtr_tpu.stages.infer": _lazy_infer,
    "gandtr_tpu.stages.validate": _lazy_validate,
    **stage_mod.FUNCTIONS,
    # reference names — the original iccv23 YAMLs resolve unchanged
    "mdir.stages.train.train": _lazy_train,
    "mdir.stages.validate.validate": _lazy_validate,
    "mdir.stages.infer.infer": _lazy_infer,
    "gandtr_tpu.stages.infer_incrementally": _lazy_infer_incrementally,
    "gandtr_tpu.stages.export": _lazy_export,
    "gandtr_tpu.stages.build_index": _lazy_build_index,
    "mdir.stages.infer.infer_incrementally": _lazy_infer_incrementally,
    "mdir.stages.multistep.infer_and_learn_whitening": lambda p, d: __import__(
        "gandtr_tpu.scenarios.multistep_stage", fromlist=["x"]
    ).infer_and_learn_whitening(p, d),
    "gandtr_tpu.stages.multistep.infer_and_learn_whitening": lambda p, d: __import__(
        "gandtr_tpu.scenarios.multistep_stage", fromlist=["x"]
    ).infer_and_learn_whitening(p, d),
    "gandtr_tpu.utils.download.rsfm120k": _download("rsfm120k"),
    "gandtr_tpu.utils.download.roxf5k_rpar6k_247tokyo1k":
        _download("roxf5k_rpar6k_247tokyo1k"),
    "cirtorch.utils.download.download_train": _download("rsfm120k"),
    "cirtorch.utils.download.download_test": _download("roxf5k_rpar6k_247tokyo1k"),
    "mdir.utils.download.rsfm120k": _download("rsfm120k"),
    "mdir.utils.download.roxf5k_rpar6k_247tokyo1k": _download("roxf5k_rpar6k_247tokyo1k"),
    "print_scores": print_scores,
}

NEEDS_DATA = {"mdir.stages.infer.infer", "gandtr_tpu.stages.infer",
              "gandtr_tpu.stages.build_index"}


def parse_targets(scenario, targets, path=""):
    acc = []
    for target in targets:
        target_acc = []
        steps = {x: scenario[target][x] for x in sorted(scenario[target])
                 if not x.startswith("_")}
        for step, section in steps.items():
            if not isinstance(section, dict):
                continue
            function = section.pop("__function__", None)
            if function not in FUNCTIONS:
                raise ValueError("Step '%s' in target '%s' needs undefined "
                                 "function '%s'" % (step, target, function))
            target_acc.append((step, function, section))
        acc.append((target, target_acc))
    return acc


def derive_scenario_name(specs):
    """${SCENARIO_NAME} comes from the LAST yaml path (reference
    perform_scenario.py:116, os.path.basename(paths[-1])): overlay chains are
    named after the most-derived file. key=value overrides don't count."""
    yaml_specs = [s for s in specs if "=" not in s.split("/")[-1]]
    return (yaml_specs[-1] if yaml_specs else specs[-1]) \
        .rsplit("/", 1)[-1].rsplit(".", 1)[0]


def run_target(scenario, target, scenario_name, stdin_data=None):
    """Run one target's sorted steps, threading metadata context
    (perform_scenario.py:108-131)."""
    (target_name, steps), = parse_targets(scenario, [target])
    context = {"SCENARIO_NAME": scenario_name}
    results = {}
    for step, function, section in steps:
        # reference semantics (perform_scenario.py:117-130): the step's own
        # context entry holds its parameters dict, which resolve_variables
        # mutates in place — so later ${<step>.parameters.<key>} references
        # see the RESOLVED values of already-run steps
        context[step] = {"function": function, "parameters": section}
        params = resolve_variables(section, context)
        params.pop("__doc__", None)
        data = ()
        if function in NEEDS_DATA and stdin_data is not None:
            data = (stdin_data,)
        out = FUNCTIONS[function](copy.deepcopy(params), data)
        metadata = out[0] if out else {}
        context[step]["_output_metadata"] = metadata
        results[step] = metadata
    return results


def doctor():
    """Environment self-check: platform, devices, compile cache, native
    loader — the usual TPU-container gotchas (CLAUDE.md) in one command."""
    print("gandtr_tpu doctor")
    print("  JAX_PLATFORMS env: %r (note: some containers pin this via "
          "sitecustomize; use jax.config to force)"
          % os.environ.get("JAX_PLATFORMS"))
    import jax
    try:
        devs = jax.devices()
        print("  backend: %s, %d device(s): %s"
              % (jax.default_backend(), len(devs),
                 ", ".join(str(d) for d in devs[:8])))
    except Exception as exc:
        print("  backend init FAILED: %s" % exc)
        return 1
    import jax.numpy as jnp
    try:
        val = float(jax.jit(lambda a: (a @ a.T).sum())(jnp.ones((8, 128))))
        print("  jit probe: OK (%.0f)" % val)
    except Exception as exc:
        print("  jit probe FAILED (wedged backend?): %s" % exc)
        return 1
    from gandtr_tpu.utils.compile_cache import enable_from_env
    print("  compile cache: %s"
          % ("disabled (GANDTR_TPU_COMPILE_CACHE=0)"
             if os.environ.get("GANDTR_TPU_COMPILE_CACHE") == "0"
             else (enable_from_env(default_on=True) or "enabled")))
    try:
        from gandtr_tpu import native
        if native.available():
            print("  native image loader: available")
        else:
            print("  native image loader: unavailable (%s); PIL fallback"
                  % native.build_error())
    except Exception as exc:
        print("  native image loader: unavailable (%s); PIL fallback" % exc)
    n = len(devs)
    print("  multi-chip: %d visible device(s); dp auto-shards train batches "
          "that divide %d" % (n, n))
    print("OK")
    return 0


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("action",
                        help="target name, 'list', 'validate' or 'doctor'")
    parser.add_argument("scenario", nargs="*",
                        help="yaml files / key=value overrides (later wins)")
    args = parser.parse_args(argv)

    if args.action == "doctor":
        return doctor()
    if not args.scenario:
        parser.error("scenario yaml required for action %r" % args.action)

    from gandtr_tpu.utils.compile_cache import enable_from_env
    enable_from_env(default_on=True)

    scenario = load_yaml_scenario(args.scenario)
    targets = [k for k in scenario if isinstance(scenario.get(k), dict)]

    if args.action == "list":
        for t in targets:
            doc = scenario[t].get("__doc__", "")
            print("%-12s %s" % (t, doc))
        return 0
    if args.action == "validate":
        parse_targets(scenario, targets)
        print("OK: %d targets, all step functions resolve" % len(targets))
        return 0

    scenario_name = derive_scenario_name(args.scenario)
    stdin_data = None
    if not sys.stdin.isatty():
        try:
            stdin_data = [x.strip() for x in sys.stdin.readlines()
                          if x.strip()]
        except (OSError, ValueError, io.UnsupportedOperation):
            stdin_data = None  # non-tty without readable stdin (test harness)
    run_target(scenario, args.action, scenario_name, stdin_data)
    return 0


if __name__ == "__main__":
    sys.exit(main())
