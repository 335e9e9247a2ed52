"""Minimal TensorBoard event-file writer (no tensorboardX dependency).

Counterpart of the reference's Tensorboard streamer (eventprocessor.py:404-461,
absolute iteration counters). Writes standard `events.out.tfevents.*` files:
TFRecord framing (length + masked crc32c) around hand-encoded tensorflow.Event
protos with scalar summaries — enough for TensorBoard's scalars dashboard.
"""
import os
import socket
import struct
import time


# --- crc32c (software, Castagnoli polynomial) ---

_CRC_TABLE = []


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE:
        return _CRC_TABLE
    poly = 0x82F63B78
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table.append(crc)
    _CRC_TABLE = table
    return table


def crc32c(data):
    table = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data):
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- protobuf encoding (just the fields TensorBoard scalars need) ---

def _varint(n):
    out = b""
    while True:
        b7 = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def _field(num, wire, payload):
    return _varint((num << 3) | wire) + payload


def _len_field(num, payload):
    return _field(num, 2, _varint(len(payload)) + payload)


def encode_scalar_event(tag, value, step, wall_time=None):
    """tensorflow.Event{wall_time=1, step=2, summary=5{value{tag=1,
    simple_value=2}}}."""
    value_msg = _len_field(1, tag.encode("utf8")) + \
        _field(2, 5, struct.pack("<f", float(value)))
    summary = _len_field(1, value_msg)
    event = _field(1, 1, struct.pack("<d", wall_time or time.time())) + \
        _field(2, 0, _varint(int(step))) + \
        _len_field(5, summary)
    return event


def encode_file_version(wall_time=None):
    event = _field(1, 1, struct.pack("<d", wall_time or time.time())) + \
        _len_field(3, b"brain.Event:2")
    return event


def write_record(f, data):
    header = struct.pack("<Q", len(data))
    f.write(header)
    f.write(struct.pack("<I", _masked_crc(header)))
    f.write(data)
    f.write(struct.pack("<I", _masked_crc(data)))


class TensorboardWriter:
    """Streamer with the EventBroker interface: live scalar events with
    absolute iteration counters (eventprocessor.py:430-447)."""

    def __init__(self, directory):
        logdir = os.path.join(directory, "epochs", "tensorboard")
        os.makedirs(logdir, exist_ok=True)
        fname = "events.out.tfevents.%d.%s" % (int(time.time()),
                                               socket.gethostname())
        self._f = open(os.path.join(logdir, fname), "ab")
        write_record(self._f, encode_file_version())
        self._epoch_sizes = {}

    def register(self, epoch, iteration, epoch_size, key, value, dtype):
        if not dtype.startswith("scalar"):
            return
        if epoch_size:
            self._epoch_sizes[key] = epoch_size
        size = self._epoch_sizes.get(key, 1)
        step = (epoch - 1) * size + (iteration if iteration is not None else size)
        write_record(self._f, encode_scalar_event(key, float(value), step))

    def close_epoch(self, epoch):
        self._f.flush()

    def close(self):
        self._f.close()


def read_scalar_events(path):
    """Tiny reader for tests: yields (tag, value, step) from an event file."""
    out = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            (length,) = struct.unpack("<Q", header)
            f.read(4)
            data = f.read(length)
            f.read(4)
            out.append(data)
    events = []
    for data in out:
        tag, value, step = None, None, 0
        i = 0
        while i < len(data):
            key = data[i]; i += 1
            num, wire = key >> 3, key & 7
            if wire == 0:  # varint
                v = 0; shift = 0
                while True:
                    b = data[i]; i += 1
                    v |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                if num == 2:
                    step = v
            elif wire == 1:
                i += 8
            elif wire == 5:
                i += 4
            elif wire == 2:
                ln = 0; shift = 0
                while True:
                    b = data[i]; i += 1
                    ln |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                payload = data[i:i + ln]; i += ln
                if num == 5:  # summary -> value -> tag/simple_value
                    j = 0
                    while j < len(payload):
                        k2 = payload[j]; j += 1
                        if k2 >> 3 == 1 and k2 & 7 == 2:
                            l2 = payload[j]; j += 1
                            vmsg = payload[j:j + l2]; j += l2
                            m = 0
                            while m < len(vmsg):
                                k3 = vmsg[m]; m += 1
                                if k3 >> 3 == 1 and k3 & 7 == 2:
                                    l3 = vmsg[m]; m += 1
                                    tag = vmsg[m:m + l3].decode(); m += l3
                                elif k3 >> 3 == 2 and k3 & 7 == 5:
                                    (value,) = struct.unpack("<f", vmsg[m:m + 4])
                                    m += 4
                                else:
                                    m = len(vmsg)
                        else:
                            j = len(payload)
        if tag is not None:
            events.append((tag, value, step))
    return events
