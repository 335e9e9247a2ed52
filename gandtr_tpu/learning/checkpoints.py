"""Checkpoint store: per-epoch multi-network checkpointing with best/last/
frozen semantics.

Mirrors /root/reference/mdir/learning/checkpoints.py: `<name>_epoch_%02d.ckpt`
files per subnet, `_best`/`_last`/`_frozen` symlinks, `store_every` (kept) vs
`checkpoint_every` (transient, GC'd) epochs, atomic writes via `.tmp`+rename,
frozen subnets stored once and symlinked, and resume via `load_latest_epoch`.
Serialization is flax msgpack over the variables pytree + a JSON sidecar of
numpy-free training metadata.
"""
import os
import pickle

import numpy as np
import jax
import flax.serialization


BEST_SUFFIX = "_best"
LAST_SUFFIX = "_last"
FROZEN_SUFFIX = "_frozen"


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class Checkpoints:
    def __init__(self, directory, store_every=10, checkpoint_every=2,
                 directory_epoch_regex=None):
        self.directory = directory
        self.epochs_dir = os.path.join(directory, "epochs")
        self.store_every = int(store_every) if store_every else 0
        self.checkpoint_every = int(checkpoint_every) if checkpoint_every else 0
        os.makedirs(self.epochs_dir, exist_ok=True)

    # --- paths ---

    def _net_path(self, name, epoch):
        return os.path.join(self.epochs_dir, "%s_epoch_%02d.ckpt" % (name, epoch))

    def _link_path(self, name, suffix):
        return os.path.join(self.epochs_dir, "%s%s.ckpt" % (name, suffix))

    def _train_path(self, epoch):
        return os.path.join(self.epochs_dir, "training_epoch_%02d.pkl" % epoch)

    # --- save ---

    def _atomic_write(self, path, data):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def _symlink(self, target, link):
        if os.path.islink(link) or os.path.exists(link):
            os.remove(link)
        os.symlink(os.path.basename(target), link)

    def save_epoch(self, epoch, net_states, train_state=None, frozen=(),
                   is_best=False, is_last=False):
        """net_states: {name: variables pytree}. Frozen nets are stored once
        and symlinked per epoch; epoch files + the resumable training file
        are written only on checkpoint_every/store_every boundaries (or the
        final epoch) like the reference (checkpoints.py:60-113) — best/last
        states of intermediate epochs are written directly at the shortcut
        path instead (was: full serialization every epoch; found by review)."""
        is_checkpointed = (self.checkpoint_every > 0
                           and epoch % self.checkpoint_every == 0) or is_last
        is_stored = self.store_every > 0 and epoch % self.store_every == 0
        write_epoch = is_checkpointed or is_stored
        for name, variables in net_states.items():
            path = self._net_path(name, epoch)
            if name in frozen:
                frozen_path = self._link_path(name, FROZEN_SUFFIX)
                if not os.path.exists(frozen_path):
                    self._atomic_write(frozen_path, flax.serialization.to_bytes(
                        _to_numpy(variables)))
                if write_epoch:
                    self._symlink(frozen_path, path)
                for cond, suffix in ((is_best, BEST_SUFFIX),
                                     (is_last, LAST_SUFFIX)):
                    if cond:
                        self._symlink(frozen_path,
                                      self._link_path(name, suffix))
                continue
            data = None
            if write_epoch or is_best or is_last:
                data = flax.serialization.to_bytes(_to_numpy(variables))
            if write_epoch:
                self._atomic_write(path, data)
            for cond, suffix in ((is_best, BEST_SUFFIX),
                                 (is_last, LAST_SUFFIX)):
                if not cond:
                    continue
                link = self._link_path(name, suffix)
                if write_epoch:
                    self._symlink(path, link)
                else:
                    if os.path.islink(link):
                        os.remove(link)
                    self._atomic_write(link, data)

        if train_state is not None and write_epoch:
            self._atomic_write(self._train_path(epoch), pickle.dumps(train_state))

        self._gc(epoch, net_states, frozen)

    def _keep(self, epoch):
        if self.store_every and epoch % self.store_every == 0:
            return True
        return False

    def _gc(self, current_epoch, net_states, frozen):
        """Delete transient checkpoints of previous epochs
        (checkpoints.py:118-136)."""
        for e in range(current_epoch):
            if self._keep(e):
                continue
            protected = set()
            for name in net_states:
                for suffix in (BEST_SUFFIX, LAST_SUFFIX):
                    link = self._link_path(name, suffix)
                    if os.path.islink(link):
                        protected.add(os.path.realpath(link))
            for name in net_states:
                p = self._net_path(name, e)
                if os.path.lexists(p) and os.path.realpath(p) not in protected \
                        and p not in protected:
                    # os.remove on a symlink removes the link, never the
                    # frozen target it points to
                    os.remove(p)
            tp = self._train_path(e)
            if os.path.exists(tp):
                os.remove(tp)

    # --- load ---

    def load_net(self, name, epoch_or_suffix, template):
        """Load variables into the structure of `template` (a variables pytree
        from module.init)."""
        if isinstance(epoch_or_suffix, int):
            path = self._net_path(name, epoch_or_suffix)
        else:
            path = self._link_path(name, epoch_or_suffix)
        with open(path, "rb") as f:
            return flax.serialization.from_bytes(template, f.read())

    def available_epochs(self):
        eps = set()
        for fn in os.listdir(self.epochs_dir):
            if fn.startswith("training_epoch_") and fn.endswith(".pkl"):
                eps.add(int(fn[len("training_epoch_"):-len(".pkl")]))
        return sorted(eps)

    def load_latest_epoch(self):
        """Returns (epoch, train_state) or (None, None) (checkpoints.py:159-204)."""
        for epoch in reversed(self.available_epochs()):
            path = self._train_path(epoch)
            try:
                with open(path, "rb") as f:
                    return epoch, pickle.load(f)
            except (EOFError, pickle.UnpicklingError):
                continue
        return None, None


def load_network_file(path, template):
    """Load a standalone checkpoint file into a template pytree
    (checkpoints.py:208-220 file branch)."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def adopt_from_directory_regex(checkpoints, directory_epoch_regex,
                               net_names=None):
    """Cross-experiment adoption (reference checkpoints.py:171-204): when this
    experiment has no checkpoints, find a finished experiment whose directory
    matches `directory_epoch_regex` (a regex over sibling directory names with
    one group capturing its epoch count), copy its `_best` nets in as epoch-0
    checkpoints and return the adopted epoch count (0-based start here —
    training proceeds from epoch 1 with adopted weights)."""
    import re
    import shutil

    if checkpoints.available_epochs():
        return None
    parent = os.path.dirname(os.path.abspath(checkpoints.directory))
    pattern = re.compile(directory_epoch_regex)
    candidates = []
    if os.path.isdir(parent):
        for name in os.listdir(parent):
            m = pattern.fullmatch(name)
            if m and os.path.isdir(os.path.join(parent, name, "epochs")):
                try:
                    epochs = int(m.group(1)) if m.groups() else 0
                except (ValueError, IndexError):
                    epochs = 0
                candidates.append((epochs, os.path.join(parent, name)))
    if not candidates:
        return None
    epochs, src_dir = max(candidates)
    src_epochs = os.path.join(src_dir, "epochs")
    copied = 0
    for fn in os.listdir(src_epochs):
        if fn.endswith("%s.ckpt" % BEST_SUFFIX):
            name = fn[:-len("%s.ckpt" % BEST_SUFFIX)]
            if net_names and name not in net_names:
                continue
            dst = checkpoints._net_path(name, 0)
            shutil.copyfile(os.path.realpath(os.path.join(src_epochs, fn)), dst)
            checkpoints._symlink(dst, checkpoints._link_path(name, BEST_SUFFIX))
            copied += 1
    return {"adopted_from": src_dir, "epochs": epochs, "nets": copied} if copied else None
