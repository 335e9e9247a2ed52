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
        # reference contract (checkpoints.py:31-34): a 3-group regex over the
        # epochs-directory path (prefix, epoch count, postfix) enabling resume
        # from a finished sibling experiment with fewer epochs
        self.directory_epoch_regex = directory_epoch_regex
        # 1-based epoch adopted from a sibling experiment; the GC must never
        # target epochs <= this (reference checkpoints.py:40,66-67,202 — the
        # adopted epoch's files live in the SIBLING directory, never locally)
        self.epoch_externally_loaded = 0
        # (sibling epochs dir, epoch) the adopted nets live in; load_net falls
        # back there for that epoch (the reference reads them from the sibling
        # directory directly, checkpoints.py:200)
        self._adopted = None
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

    def save_notrain(self, net_states):
        """Zero-epoch training: store the off-the-shelf networks as
        `<name>_notrain` with `_best`/`_last` pointing at them (reference
        checkpoints.py:42-56, driven by stages/train.py:17-20 when a train
        stage is configured with `epochs: 0`)."""
        for name, variables in net_states.items():
            path = os.path.join(self.epochs_dir, "%s_notrain.ckpt" % name)
            self._atomic_write(path, flax.serialization.to_bytes(
                _to_numpy(variables)))
            self._symlink(path, self._link_path(name, BEST_SUFFIX))
            self._symlink(path, self._link_path(name, LAST_SUFFIX))

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
        if callable(train_state):
            # lazy form: materializing the full host-side training state
            # (optimizer moments + event history) costs a device_get per
            # epoch; only pay it on epochs that actually write
            train_state = train_state() if write_epoch else None
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

        # GC exactly like the reference (checkpoints.py:61-67,115-132): only
        # when a NEW checkpoint was written, and only the PREVIOUS checkpoint
        # epoch is deleted — its training file unconditionally (even at a
        # store_every epoch: reference line 115-116 has no last_is_stored
        # guard there, found by differential fuzz), its net files only when
        # the previous checkpoint is not a store_every epoch.
        if is_checkpointed:
            prev = (epoch - (epoch % self.checkpoint_every
                             or self.checkpoint_every)
                    if self.checkpoint_every > 0 else 0)
            if prev <= self.epoch_externally_loaded:
                prev = 0
            if prev >= 1:
                tp = self._train_path(prev)
                if os.path.exists(tp):
                    os.remove(tp)
                prev_is_stored = (self.store_every > 0
                                  and prev % self.store_every == 0)
                if not prev_is_stored:
                    for name in net_states:
                        self._gc_net(name, prev)

    def _gc_net(self, name, epoch):
        """Delete one net's file at a GC'd epoch. If the `_best` shortcut is a
        symlink to it, the payload migrates into the shortcut as a regular
        file instead of lingering — the reference renames the epoch file into
        `_bestsofar` in exactly this situation (checkpoints.py:126-132)."""
        p = self._net_path(name, epoch)
        if not os.path.lexists(p):
            return
        if os.path.islink(p):
            # frozen nets' per-epoch symlinks: removing the link never touches
            # the frozen target, and best/last links point at the frozen file
            # directly
            os.remove(p)
            return
        best = self._link_path(name, BEST_SUFFIX)
        if os.path.islink(best) and os.path.realpath(best) == os.path.realpath(p):
            os.remove(best)
            os.rename(p, best)
        else:
            os.remove(p)

    # --- load ---

    def load_net(self, name, epoch_or_suffix, template):
        """Load variables into the structure of `template` (a variables pytree
        from module.init)."""
        if isinstance(epoch_or_suffix, int):
            path = self._net_path(name, epoch_or_suffix)
            if not os.path.exists(path) and self._adopted \
                    and self._adopted[1] == epoch_or_suffix:
                # adopted epoch: nets live in the sibling experiment's dir
                # (reference checkpoints.py:200 loads them from there)
                path = os.path.join(
                    self._adopted[0],
                    "%s_epoch_%02d.ckpt" % (name, epoch_or_suffix))
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
        """Returns (epoch, train_state) or (None, None) (checkpoints.py:159-204).
        With no local epochs and `directory_epoch_regex` set, falls back to
        adopting a finished sibling experiment with fewer epochs."""
        for epoch in reversed(self.available_epochs()):
            path = self._train_path(epoch)
            try:
                with open(path, "rb") as f:
                    return epoch, pickle.load(f)
            except (EOFError, pickle.UnpicklingError):
                continue
        if self.directory_epoch_regex:
            adopted = self.adopt_previous_experiment()
            if adopted is not None:
                return adopted
        return None, None

    def adopt_previous_experiment(self):
        """Continue from a finished experiment with fewer epochs (reference
        checkpoints.py:171-204): `directory_epoch_regex` is a 3-group regex
        (prefix, epoch count, postfix) matched against this experiment's
        epochs-directory path; sibling directories are constructed by
        substituting smaller epoch counts into group 2. The newest sibling
        whose final training file exists is adopted: its epoch net files,
        `_best` nets, blobs, and training state are copied in, and
        (epoch, train_state) is returned so resume proceeds from epoch+1."""
        import re
        import shutil

        path = os.path.abspath(self.epochs_dir)
        m = re.search(self.directory_epoch_regex, path)
        assert m, ("directory_epoch_regex %r does not match "
                   "learning.checkpoints.directory %r"
                   % (self.directory_epoch_regex, path))
        assert len(m.groups()) == 3, \
            "directory_epoch_regex must contain 3 groups (prefix, epoch, postfix)"
        for epoch1 in reversed(range(1, int(m.group(2)))):
            src = "%s%s%s" % (m.group(1), epoch1, m.group(3))
            tp = os.path.join(src, "training_epoch_%02d.pkl" % epoch1)
            if not os.path.isdir(src) or not os.path.exists(tp):
                continue
            suffix = "_epoch_%02d.ckpt" % epoch1
            names = sorted(fn[:-len(suffix)] for fn in os.listdir(src)
                           if fn.endswith(suffix))
            if not names:
                continue
            # verify epochs were parsed correctly (reference line 184-185):
            # the _last shortcut must resolve to that epoch's file
            for name in names:
                last = os.path.join(src, name + LAST_SUFFIX + ".ckpt")
                if os.path.lexists(last):
                    assert os.path.realpath(last) == \
                        os.path.realpath(os.path.join(src, name + suffix)), \
                        "%s does not resolve to %s" % (last, name + suffix)
            for name in names:
                # only the best-so-far network is retained locally as a
                # regular file (reference copies _best into _bestsofar,
                # checkpoints.py:190-193); the adopted epoch's net/training
                # files stay in the sibling dir — load_net resolves them there
                best = os.path.join(src, name + BEST_SUFFIX + ".ckpt")
                if os.path.lexists(best):
                    shutil.copyfile(os.path.realpath(best),
                                    self._link_path(name, BEST_SUFFIX))
            src_blobs = os.path.join(src, "blobs")
            if os.path.isdir(src_blobs):
                dst_blobs = os.path.join(self.epochs_dir, "blobs")
                if os.path.isdir(dst_blobs):
                    shutil.rmtree(dst_blobs)
                shutil.copytree(src_blobs, dst_blobs)
            with open(tp, "rb") as f:
                state = pickle.load(f)
            # protect the adopted epoch from the previous-checkpoint GC
            # (reference checkpoints.py:66-67,202)
            self.epoch_externally_loaded = epoch1
            self._adopted = (src, epoch1)
            print(">> Loading epoch %02d from experiment %s" % (epoch1, src))
            return epoch1, state
        return None


def load_network_file(path, template):
    """Load a standalone checkpoint file into a template pytree
    (checkpoints.py:208-220 file branch)."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


def adopt_from_directory_regex(checkpoints, directory_epoch_regex):
    """Cross-experiment adoption under the reference's 3-group regex contract
    (checkpoints.py:31-34,171-204): group 1 = path prefix, group 2 = epoch
    count, group 3 = postfix. Returns (epoch, train_state) or None."""
    if checkpoints.available_epochs():
        return None
    checkpoints.directory_epoch_regex = directory_epoch_regex
    return checkpoints.adopt_previous_experiment()
