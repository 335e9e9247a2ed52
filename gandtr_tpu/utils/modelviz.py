"""Architecture visualization: the reference renders a torchviz autograd
graph per network (mdir/learning/network.py:272-274, external/torchviz/dot.py)
for the HTML report. The TPU-native equivalent inspects the *compiled
program*, not an autograd tape: we emit Graphviz DOT text from the jaxpr of
the model's apply (works for anything jittable, no graphviz binary needed)
plus a parameter-tree summary table.
"""
import jax
import numpy as np


def param_summary(variables):
    """Flatten a variables pytree into [(path, shape, dtype, size)] rows plus
    the total parameter count."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    rows = []
    total = 0
    for path, leaf in flat:
        name = "/".join(
            getattr(p, "key", getattr(p, "name", str(getattr(p, "idx", p))))
            for p in path)
        shape = tuple(np.shape(leaf))
        size = int(np.prod(shape)) if shape else 1
        rows.append((name, shape, str(np.asarray(leaf).dtype
                                      if not hasattr(leaf, "dtype")
                                      else leaf.dtype), size))
        total += size
    return rows, total


def format_summary(variables, title="model"):
    rows, total = param_summary(variables)
    width = max([len(r[0]) for r in rows] + [10])
    lines = ["%s (%d params)" % (title, total)]
    for name, shape, dtype, size in rows:
        lines.append("  %-*s %-18s %-10s %d" % (width, name, str(shape),
                                                dtype, size))
    return "\n".join(lines)


def _ident(v, names):
    if v not in names:
        names[v] = "n%d" % len(names)
    return names[v]


def jaxpr_dot(fn, *example_args, max_nodes=400, **example_kwargs):
    """DOT digraph of `fn`'s jaxpr: one node per primitive equation, edges by
    value flow. Large graphs are truncated at `max_nodes` with an ellipsis
    node (the reference's PNG renders are similarly illegible past that)."""
    jaxpr = jax.make_jaxpr(fn)(*example_args, **example_kwargs).jaxpr
    names = {}
    lines = ["digraph jaxpr {", "  rankdir=TB;",
             '  node [shape=box, fontsize=10];']
    for i, var in enumerate(jaxpr.invars):
        nid = _ident(var, names)
        lines.append('  %s [label="input%d %s", shape=ellipse, '
                     'fillcolor=lightblue, style=filled];'
                     % (nid, i, getattr(var, "aval", "")))
    produced = {v: _ident(v, names) for v in jaxpr.invars}
    count = 0
    for eqn in jaxpr.eqns:
        if count >= max_nodes:
            lines.append('  trunc [label="... %d more equations", '
                         'shape=plaintext];' % (len(jaxpr.eqns) - count))
            break
        count += 1
        eqn_id = "e%d" % count
        lines.append('  %s [label="%s"];' % (eqn_id, eqn.primitive.name))
        for v in eqn.invars:
            if hasattr(v, "val"):  # literal
                continue
            if v in produced:
                lines.append("  %s -> %s;" % (produced[v], eqn_id))
        for v in eqn.outvars:
            produced[v] = eqn_id
    for i, var in enumerate(jaxpr.outvars):
        nid = "out%d" % i
        lines.append('  %s [label="output%d", shape=ellipse, '
                     'fillcolor=lightgreen, style=filled];' % (nid, i))
        if var in produced:
            lines.append("  %s -> %s;" % (produced[var], nid))
    lines.append("}")
    return "\n".join(lines)


def architecture_graph(net, variables, input_shape=(1, 64, 64, 3),
                       dtype=np.float32, max_nodes=400):
    """DOT graph of a WrappedNet/flax module apply on a zero input of
    `input_shape` (network.py:257-266 uses a zero 512x512 probe; smaller here
    since only the traced structure matters, not the values)."""
    import jax.numpy as jnp
    x = jnp.zeros(input_shape, dtype)

    def fwd(v, xx):
        apply = getattr(net, "apply", None)
        return apply(v, xx)

    return jaxpr_dot(fwd, variables, x, max_nodes=max_nodes)
