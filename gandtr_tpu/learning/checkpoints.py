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

        # GC only when a NEW checkpoint was written (reference
        # checkpoints.py:115-132 deletes the previous checkpoint inside the
        # is_checkpointed branch) — running it every epoch would delete the
        # latest transient checkpoint one epoch later and make crash-resume
        # impossible between boundaries (found by review)
        if write_epoch:
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
                if not os.path.lexists(p):
                    continue
                if os.path.islink(p):
                    # frozen nets' per-epoch symlinks: removing the link never
                    # touches the frozen target, and best/last links point at
                    # the frozen file directly — always safe to GC (the
                    # realpath check below would wrongly protect them forever)
                    os.remove(p)
                elif os.path.realpath(p) not in protected and p not in protected:
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
                shutil.copyfile(os.path.realpath(os.path.join(src, name + suffix)),
                                self._net_path(name, epoch1))
                best = os.path.join(src, name + BEST_SUFFIX + ".ckpt")
                if os.path.lexists(best):
                    # retain the best-so-far network as a regular file
                    # (reference copies _best into _bestsofar)
                    shutil.copyfile(os.path.realpath(best),
                                    self._link_path(name, BEST_SUFFIX))
            src_blobs = os.path.join(src, "blobs")
            if os.path.isdir(src_blobs):
                dst_blobs = os.path.join(self.epochs_dir, "blobs")
                if os.path.isdir(dst_blobs):
                    shutil.rmtree(dst_blobs)
                shutil.copytree(src_blobs, dst_blobs)
            shutil.copyfile(tp, self._train_path(epoch1))
            with open(self._train_path(epoch1), "rb") as f:
                state = pickle.load(f)
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
