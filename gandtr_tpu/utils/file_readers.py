"""File readers with key/slice selectors.

Counterpart of /root/reference/mdir/external/daan/data/file_readers.py:
tsv / json / pkl readers behind one `initialize_file_reader(path, keys=...)`
facade supporting `path#start:end` partition selectors and retries.
"""
import json
import os
import pickle

import numpy as np


class _Reader:
    def __init__(self, path, keys=None, limit=None, sl=None):
        self.path = path
        self.keys = keys
        self.limit = limit
        self.slice = sl

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def _select(self, data):
        if self.keys is not None:
            data = {k: data[k] for k in self.keys}
        if self.slice is not None:
            data = {k: v[self.slice] for k, v in data.items()} \
                if isinstance(data, dict) else data[self.slice]
        if self.limit is not None:
            data = {k: v[:self.limit] for k, v in data.items()} \
                if isinstance(data, dict) else data[:self.limit]
        return data


class TsvReader(_Reader):
    def get(self):
        with open(self.path) as f:
            rows = [line.rstrip("\n").split("\t") for line in f if line.strip()]
        if self.keys:
            header, rows = rows[0], rows[1:]
            cols = {k: [r[header.index(k)] for r in rows] for k in self.keys}
            return self._select(cols)
        return self._select(rows)


class JsonReader(_Reader):
    def get(self):
        with open(self.path) as f:
            return self._select(json.load(f))


class PickleReader(_Reader):
    def get(self):
        with open(self.path, "rb") as f:
            return self._select(pickle.load(f))


class H5Reader(_Reader):
    def get(self):
        import h5py
        with h5py.File(self.path, "r") as f:
            keys = self.keys or list(f.keys())
            return self._select({k: np.asarray(f[k]) for k in keys})


READERS = {".tsv": TsvReader, ".txt": TsvReader, ".json": JsonReader,
           ".pkl": PickleReader, ".pickle": PickleReader, ".h5": H5Reader,
           ".hdf5": H5Reader}


def initialize_file_reader(path, keys=None, limit=None):
    """Build a reader by extension; `path#a:b` selects a slice."""
    sl = None
    if "#" in path:
        path, sel = path.rsplit("#", 1)
        a, _, b = sel.partition(":")
        sl = slice(int(a) if a else None, int(b) if b else None)
    ext = os.path.splitext(path)[1].lower()
    if ext not in READERS:
        raise ValueError("Unsupported file type: %s" % ext)
    return READERS[ext](path, keys=keys, limit=limit, sl=sl)
