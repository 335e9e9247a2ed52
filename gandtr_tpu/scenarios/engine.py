"""YAML scenario engine: overlay chains, __template__ includes, ${var}
resolution, key*/key+ operators.

Re-implementation of the reference config system (SURVEY.md §5.6):
/root/reference/mdir/tools/utils.py:21-112 and
/root/reference/mdir/external/daan/core/experiments.py:1-59. Scenarios are the
reference's real public UX — the same iccv23 YAML files load unchanged.
"""
import copy
import json
import os
import re
from functools import reduce

import yaml


def deep_set(params, deep_key, value):
    reduce(lambda x, y: x.setdefault(y, {}), deep_key[:-1], params)[deep_key[-1]] = value
    return params


def get_deeply(data, field, ignore_nonexistent=False, support_list=False):
    """Nested field access; field is a list of path segments."""
    if not isinstance(field, (list, tuple)):
        return data.get(field, {}) if ignore_nonexistent else data[field]
    if not field:
        return data
    if support_list and isinstance(data, (list, tuple)):
        if isinstance(field[0], str) and not field[0].isdecimal() and ignore_nonexistent:
            return []
        idx = int(field[0])
        nxt = [] if ignore_nonexistent and idx >= len(data) else data[idx]
        return get_deeply(nxt, field[1:], ignore_nonexistent, support_list)
    if not isinstance(data, dict):
        raise ValueError("Cannot access field '%s' of non-dictionary '%s'" % (field, data))
    nxt = data.get(field[0], {}) if ignore_nonexistent else data[field[0]]
    return get_deeply(nxt, field[1:], ignore_nonexistent, support_list)


def dict_deep_overlay(*data, list_replace=False):
    """Deep overlay with `key*` (replace) and `key+` (append) operators."""
    if len(data) == 1:
        return data[0]
    if len(data) != 2:
        head = dict_deep_overlay(data[0], data[1], list_replace=list_replace)
        return dict_deep_overlay(head, *data[2:], list_replace=list_replace)

    original, overlay = data
    if isinstance(original, (list, tuple)) and isinstance(overlay, dict):
        for key, item in overlay.items():
            assert isinstance(key, int)
            original[key] = dict_deep_overlay(original[key], item)
    elif not isinstance(original, type(overlay)):
        return overlay
    elif isinstance(overlay, dict):
        for key, item in overlay.items():
            if isinstance(key, str) and key.endswith("*"):
                original[key[:-1]] = item
            elif isinstance(key, str) and key.endswith("+"):
                original[key[:-1]] += item
            elif key not in original:
                original[key] = item
            else:
                original[key] = dict_deep_overlay(original[key], item,
                                                  list_replace=list_replace)
    elif isinstance(overlay, list) and not list_replace:
        raise ValueError("Cannot implicitly merge two lists, use key* or key+ "
                         "when inheriting: (%s, %s)" % (original, overlay))
    else:
        return overlay
    return original


def load_yaml_scenario(scenarios):
    """Load + overlay a chain of yaml files / `a.b.c=value` CLI overrides
    (utils.py:21-36); later files override earlier ones.

    `key=value` overrides (JSON-encoded values; trailing `*` replaces, `+`
    appends to lists) apply AFTER file loading and template expansion so they
    always win — merging them into the pre-expansion tree let a file's own
    dotted keys (e.g. hedngan.yml's `network.path`) clobber the override."""
    files = []
    overrides = []
    for spec in scenarios:
        if spec.endswith(".yml") or spec.endswith(".yaml"):
            files.append(spec)
        elif "=" in spec:
            overrides.append(spec)
        else:
            raise ValueError("Unsupported scenario spec: %s" % spec)
    scenario = _load_yaml_files(files) if files else {}
    for spec in overrides:
        deep_key, value = spec.split("=", 1)
        keys = deep_key.split(".")
        value = json.loads(value)
        if keys[-1].endswith("+"):
            keys[-1] = keys[-1][:-1]
            try:
                existing = get_deeply(scenario, keys, ignore_nonexistent=True)
            except (TypeError, ValueError):  # scalar intermediate (get_deeply
                existing = None              # raises ValueError) — replaced below
            value = (existing or []) + value
        elif keys[-1].endswith("*"):
            keys[-1] = keys[-1][:-1]
        # reference semantics (utils.py:27-34): the override is its own tree
        # deep-overlaid on top, so a scalar intermediate is REPLACED by the
        # override subtree (not an error) — e.g. `beta.x=1` over `beta: day`
        # yields `beta: {x: 1}`
        node = scenario
        for k in keys[:-1]:
            nxt = node.get(k) if isinstance(node, dict) else None
            if not isinstance(nxt, dict):
                nxt = {}
                node[k] = nxt
            node = nxt
        node[keys[-1]] = value
    return scenario


def _load_yaml_files(scenarios):
    """File-chain overlay with per-file template expansion (utils.py:21-36)."""
    first = scenarios[0]
    with open(first) as handle:
        scenario = yaml.safe_load(handle)
    if scenarios[1:]:
        scenario = dict_deep_overlay(scenario, _load_yaml_files(scenarios[1:]))
    return load_nested_templates(scenario, os.path.dirname(first))


def load_nested_templates(params, root_path):
    """Expand `__template__` includes with dotted-key deep-set support
    (utils.py:39-62)."""
    if not isinstance(params, dict):
        return params

    # Iterate: a template file may itself start with __template__ (a chain
    # like rcfgan.yml -> hedgan.yml -> parameters/train_hedgan.yml ->
    # train_hedngan.yml). The reference expands only one level (utils.py:45-56,
    # its parameter files are standalone); ours is a strict superset.
    while "__template__" in params:
        for key in list(params.keys()):
            if isinstance(key, str) and "." in key:
                deep_set(params, key.split("."), params.pop(key))
        path = os.path.join(root_path, params.pop("__template__"))
        tmpl_root = os.path.dirname(path)
        with open(path) as handle:
            template = yaml.safe_load(handle)
        params = dict_deep_overlay(template, params)
        root_path = tmpl_root

    for key, value in params.items():
        params[key] = load_nested_templates(copy.copy(value), root_path)
    return params


_VAR_RE = re.compile(r"\$\{([A-Za-z_\-0-9.]+)\}")


def _resolve_single_variable(hit, data, reference):
    try:
        var_value = copy.deepcopy(get_deeply(reference, hit.split("."),
                                             support_list=True))
    except KeyError:
        raise ValueError("Variable '%s' in '%s' cannot be expanded" % (hit, data))
    var_value = resolve_variables(var_value, reference)
    if data == "${%s}" % hit:
        return var_value
    return data.replace("${%s}" % hit, str(var_value))


def resolve_variables(data, reference):
    """Recursively expand ${dotted.path} against reference (utils.py:77-92)."""
    if isinstance(data, str):
        for hit in sorted(set(_VAR_RE.findall(data)), reverse=True):
            data = _resolve_single_variable(hit, data, reference)
    elif isinstance(data, dict):
        for key, value in list(data.items()):
            newkey = resolve_variables(key, reference)
            if newkey != key:
                del data[key]
            data[newkey] = resolve_variables(value, reference)
    elif isinstance(data, list):
        for i, value in enumerate(data):
            data[i] = resolve_variables(value, reference)
    return data
