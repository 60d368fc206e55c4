"""Deterministic pre-materialized binary fixtures for the mm/audio operators.

No binary fixture ships under /root/testdata (FIXTURES.md), so the
multimodal operators plant their own deterministic blobs. Round 12 (r11
verdict item 6): the REGISTERED form of those keys must read a
pre-materialized fixture dir via ``spark.read.format("binaryFile")`` —
not re-synthesize every blob on the driver each run. ``ensure_blob_fixture``
materializes a blob set ONCE per (kind, sf_dir, payload version) into a
deterministic staging dir and, on every later run, replays only a manifest
check, so the steady-state registered plan is a pure binaryFile scan with
zero driver synthesis work.

The payload builders live here too (shared by the wav-energy /
stride-resample and ppm-decode / color-quantize operator pairs, which
previously carried verbatim copies): each is a pure function of ``doc_id``,
which is what makes the manifest check sufficient — a fixture is fully
identified by (payload version, sorted name list).
"""

from __future__ import annotations

import hashlib
import os
import struct
import tempfile
from collections.abc import Callable, Iterable

_MANIFEST = "_MANIFEST"


def fixture_dir(kind: str, sf_dir: str) -> str:
    """The deterministic staging dir for fixture ``kind`` over ``sf_dir``
    (uid-scoped so parallel CI users never collide)."""
    return os.path.join(
        tempfile.gettempdir(),
        f"pmrwc_{kind}_{os.getuid()}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )


def ensure_blob_fixture(
    kind: str,
    sf_dir: str,
    version: int,
    names: Iterable[str],
    payload_of: Callable[[str], bytes],
) -> str:
    """Materialize ``{name: payload_of(name)}`` under the fixture dir ONCE.

    ``payload_of`` must be a pure deterministic function of the file name,
    so (version, sorted names) fully identifies the fixture content: when
    the on-disk manifest matches that digest the synthesis loop is skipped
    entirely and the caller goes straight to its binaryFile scan. Bump
    ``version`` whenever a payload builder changes shape. The manifest is
    written last via an atomic rename, so a crashed half-write re-triggers
    synthesis instead of serving a partial fixture.
    """
    names = sorted(names)
    stage = fixture_dir(kind, sf_dir)
    digest = hashlib.md5(
        f"v{version}|{','.join(names)}".encode()
    ).hexdigest()
    manifest = os.path.join(stage, _MANIFEST)
    try:
        with open(manifest) as f:
            if f.read() == digest:
                return stage
    except OSError:
        pass
    os.makedirs(stage, exist_ok=True)
    for stale in os.listdir(stage):
        os.unlink(os.path.join(stage, stale))
    for name in names:
        with open(os.path.join(stage, name), "wb") as f:
            f.write(payload_of(name))
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        f.write(digest)
    os.replace(tmp, manifest)
    return stage


def pcm16_wav_payload(doc_id: int, rate: int = 16_000) -> bytes:
    """Canonical 44-byte-header mono PCM16 WAV whose samples are the fixed
    LCG-ish integer stream both engines replay exactly:
    ``(doc_id*7919 + k*104729 + 12345) % 65536 - 32768``."""
    n = 160 + (doc_id % 17) * 8
    samples = [
        (doc_id * 7919 + k * 104729 + 12345) % 65536 - 32768 for k in range(n)
    ]
    data = struct.pack(f"<{n}h", *samples)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def ppm_p6_payload(doc_id: int) -> bytes:
    """Canonical raw-RGB P6 PPM raster (``P6\\n{w} {h}\\n255\\n`` + pixels)
    with the fixed pixel stream ``(doc_id*31 + k*7) % 256``."""
    w, h = 8 + doc_id % 8, 6 + doc_id % 6
    px = bytes((doc_id * 31 + k * 7) % 256 for k in range(w * h * 3))
    return f"P6\n{w} {h}\n255\n".encode() + px
