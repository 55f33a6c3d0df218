#!/usr/bin/env python
"""Convert BAIR robot-pushing TFRecords into per-video png directory trees
(reference: scripts/convert_bair.py).

Reads <data_dir>/softmotion30_44k/{train,test}/*.tfrecords, extracts the 30
64x64 frames under the '<i>/image_aux1/encoded' keys, and writes
<data_dir>/processed_data/<phase>/<record>/<video_k>/<frame>.png — the layout
the bair_* dataset walkers expect.

TensorFlow is only needed for this offline conversion; the records are plain
protobuf, so we fall back to a minimal protobuf-wire parser when TF is
unavailable (this image ships no tensorflow).
"""

import argparse
import glob
import os
import struct

import numpy as np
from PIL import Image


def iter_tfrecord(path):
    """Yield raw example bytes from a TFRecord file (format: 8-byte length,
    4-byte length-crc, payload, 4-byte payload-crc)."""
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            f.read(4)  # length crc
            payload = f.read(length)
            f.read(4)  # payload crc
            yield payload


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def parse_example_features(payload):
    """Minimal protobuf parse of tf.train.Example -> {name: bytes}.

    Wire layout: Example{1: Features{1: map<string, Feature>}},
    Feature{1: BytesList{1: repeated bytes}}.
    """
    def parse_msg(buf):
        fields = []
        pos = 0
        while pos < len(buf):
            tag, pos = _read_varint(buf, pos)
            field_no, wire = tag >> 3, tag & 7
            if wire == 2:  # length-delimited
                ln, pos = _read_varint(buf, pos)
                fields.append((field_no, buf[pos : pos + ln]))
                pos += ln
            elif wire == 0:
                val, pos = _read_varint(buf, pos)
                fields.append((field_no, val))
            elif wire == 5:
                fields.append((field_no, buf[pos : pos + 4]))
                pos += 4
            elif wire == 1:
                fields.append((field_no, buf[pos : pos + 8]))
                pos += 8
            else:
                raise ValueError(f"unsupported wire type {wire}")
        return fields

    out = {}
    for fno, features in parse_msg(payload):
        if fno != 1:
            continue
        for fno2, entry in parse_msg(features):
            if fno2 != 1:
                continue
            key, value = None, None
            for fno3, kv in parse_msg(entry):
                if fno3 == 1:
                    key = kv.decode()
                elif fno3 == 2:
                    value = kv
            if key is None or value is None:
                continue
            # Feature -> BytesList(field 1) -> value(field 1)
            for fno4, blist in parse_msg(value):
                if fno4 == 1:
                    for fno5, b in parse_msg(blist):
                        if fno5 == 1:
                            out[key] = b
    return out


def convert_phase(data_dir, phase, n_frames=30, size=64):
    src = os.path.join(data_dir, "softmotion30_44k", phase)
    files = sorted(glob.glob(os.path.join(src, "*")))
    if not files:
        raise RuntimeError(f"No data files found in {src}")

    n = 0
    for fpath in files:
        fname = os.path.basename(fpath)
        for k, payload in enumerate(iter_tfrecord(fpath), start=1):
            feats = parse_example_features(payload)
            out_dir = os.path.join(data_dir, "processed_data", phase,
                                   fname[:-10], str(k))
            os.makedirs(out_dir, exist_ok=True)
            for i in range(n_frames):
                raw = feats[f"{i}/image_aux1/encoded"]
                img = Image.frombytes("RGB", (size, size), raw)
                img.save(os.path.join(out_dir, f"{i}.png"))
            n += 1
            print(f"{phase} data: {fname} ({k}) ({n})")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", default="",
                        help="base directory with softmotion30_44k/")
    args = parser.parse_args()
    convert_phase(args.data_dir, "test")
    convert_phase(args.data_dir, "train")


if __name__ == "__main__":
    main()
