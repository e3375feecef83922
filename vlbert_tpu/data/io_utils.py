"""Shared dataset IO helpers (one copy; previously drifted across the four
dataset modules — see the '.zip@' vs '@' routing divergence fixed in r2)."""

from __future__ import annotations

import base64
import json


def load_jsonl(path):
    """One JSON object per non-blank line."""
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def b64_decode(s):
    """Base64 (with newlines) -> bytes, as the reference's frcnn jsons use."""
    return base64.decodebytes(s.encode())


def load_json_maybe_zip(path):
    """Plain json file, or a member inside a zip via 'archive.zip@/inner'."""
    if ".zip@" in path:
        from vlbert_tpu.data.zipreader import ZipReader

        return json.loads(ZipReader.read(path).decode())
    with open(path) as f:
        return json.load(f)
