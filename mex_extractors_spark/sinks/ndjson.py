"""Checksummed versioned NDJSON export — the reference's S3 publisher
sink contract (mex/extractors/sinks/s3.py:52-133): items serialized as
sorted-key JSON lines under a version-labeled prefix
(``publisher-{major}.{minor}/items.ndjson``, :100-104), the byte stream
sha256-checksummed (:106-109), and a ``metadata.json`` document
recording checksum / item count / package versions / timestamp
(:111-133).

Cluster shape: line rendering, part writing, AND byte verification
happen ON THE EXECUTORS (``mapInPandas`` after a global ``orderBy`` —
Spark's range-partitioned sort makes the part files globally ordered by
part id; each task re-reads its just-written file and certifies the
bytes on storage before reporting). Only a one-row-per-part manifest
returns to the driver.

Checksum scheme by layout:

- ``single_file=True`` (the reference's layout): the driver streams the
  ordered parts through sha256 while concatenating them into one
  ``items.ndjson`` — the read-back IS the concatenation pass, so it
  costs nothing extra and the recorded checksum covers the final file's
  bytes, exactly the reference's contract.
- ``single_file=False`` (the 100 TB shape): the parts stay where the
  executors wrote them and the recorded stream checksum is
  ``sha256(concat(ordered part sha256 hex digests))`` — the driver
  never opens a part file, so a large export never serializes through
  one machine's NIC/disk. Verifiability is unchanged: each part's bytes
  are certified by its own (executor-verified) sha256, and the part-sha
  list is pinned by the hash-of-hashes. NOTE: that hash is LAYOUT-bound
  (part boundaries move with shuffle partitioning / AQE coalescing);
  the cross-environment golden number for parts mode is
  ``content_sum64`` — the mod-2^64 sum of per-line sha256 prefixes,
  identical however the sorted stream is split (recorded for both
  layouts).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from mex_extractors_spark.functions.canonical import canonical_json

_PART_SCHEMA = (
    "part long, file_name string, n_rows long, part_sha256 string, "
    "line_sum64 long"
)


def _concat_and_hash_parts(
    target: str, manifest: list[tuple], out_path: str
) -> "hashlib._Hash":
    """Driver-side read-back used ONLY for ``single_file=True``: stream
    the ordered parts through sha256 while concatenating them into the
    single output file, re-verifying each part's bytes along the way."""
    stream = hashlib.sha256()
    with open(out_path, "wb") as out_fh:
        for _pid, fname, _n_rows, part_sha in manifest:
            ph = hashlib.sha256()
            with open(os.path.join(target, fname), "rb") as fh:
                while chunk := fh.read(1 << 20):
                    stream.update(chunk)
                    ph.update(chunk)
                    out_fh.write(chunk)
            if ph.hexdigest() != part_sha:
                raise RuntimeError(f"ndjson part {fname}: bytes on storage drifted")
    return stream


def export_ndjson(
    spark: SparkSession,
    df: DataFrame,
    out_dir: str,
    version_label: str = "publisher-1.0",
    order_cols: Sequence[str] | None = None,
    single_file: bool = True,
) -> dict:
    """Export ``df`` as canonical sorted-key NDJSON under
    ``out_dir/version_label/`` and return the metadata document.

    ``order_cols`` must identify rows uniquely (the table key): the
    output byte stream is deterministic for a given state only under a
    total order, which is what makes the sha256 reproducible across
    partitionings and re-runs (reference golden test:
    tests/sinks/test_s3.py:69-79).
    """
    order_cols = list(order_cols or sorted(df.columns))
    target = os.path.join(out_dir, version_label)
    os.makedirs(target, exist_ok=True)
    # a fresh export owns the version dir: clear artifacts of any prior
    # (possibly crashed) run — a re-run with fewer partitions would
    # otherwise leave orphan part files next to the new output that a
    # globbing consumer reads as data metadata.json never mentions
    for stale in os.listdir(target):
        if (
            stale.startswith("part-") and stale.endswith(".ndjson")
        ) or stale in ("items.ndjson", "metadata.json"):
            os.remove(os.path.join(target, stale))

    lines = df.select(canonical_json(df).alias("_line"), *[
        c for c in order_cols
    ]).orderBy(*order_cols).select("_line")

    def write_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        h = hashlib.sha256()
        n = 0
        line_sum = 0  # order/partitioning-independent content evidence
        path = os.path.join(target, f"part-{pid:05d}.ndjson")
        fh = None
        for pdf in batches:
            if fh is None:
                fh = open(path, "wb")
            for line in pdf["_line"]:
                payload = (line + "\n").encode("utf-8")
                fh.write(payload)
                h.update(payload)
                line_sum = (
                    line_sum
                    + int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
                ) % (1 << 64)
                n += 1
        if fh is None:
            return  # empty partition: no file, no manifest row
        fh.close()
        # executor-side read-back: certify the bytes ON STORAGE (page-
        # cached, so ~free) before the part is reported to the driver
        rb = hashlib.sha256()
        with open(path, "rb") as check:
            while chunk := check.read(1 << 20):
                rb.update(chunk)
        if rb.hexdigest() != h.hexdigest():
            raise RuntimeError(f"ndjson part {path}: bytes on storage drifted")
        yield pd.DataFrame(
            {
                "part": [pid],
                "file_name": [os.path.basename(path)],
                "n_rows": [n],
                "part_sha256": [h.hexdigest()],
                # signed view of the mod-2^64 sum (Spark long)
                "line_sum64": [line_sum - (1 << 64) if line_sum >= (1 << 63) else line_sum],
            }
        )

    rows = lines.mapInPandas(write_part, _PART_SCHEMA).collect()
    manifest = sorted(
        (r.part, r.file_name, r.n_rows, r.part_sha256) for r in rows
    )
    total = sum(n_rows for _pid, _f, n_rows, _s in manifest)
    # order- AND partitioning-independent content checksum: the mod-2^64
    # sum of per-line sha256 prefixes is identical however the sorted
    # stream was split into parts — THE cross-environment golden number
    # for parts mode (the per-part sha list is layout-bound evidence)
    content_sum = sum(int(r.line_sum64) & ((1 << 64) - 1) for r in rows) % (1 << 64)
    if single_file:
        out_path = os.path.join(target, "items.ndjson")
        stream = _concat_and_hash_parts(target, manifest, out_path)
        for _pid, fname, _n, _s in manifest:
            os.remove(os.path.join(target, fname))
        checksum = stream.hexdigest()
        scheme = "stream-bytes"
    else:
        # hash-of-hashes: the driver never opens a part file
        stream = hashlib.sha256()
        for _pid, _fname, _n, part_sha in manifest:
            stream.update(part_sha.encode("ascii"))
        checksum = stream.hexdigest()
        scheme = "sha256-of-part-sha256s"

    metadata = {
        "sha256_checksum": checksum,
        "checksum_scheme": scheme,
        "item_count": total,
        "version_label": version_label,
        "files": (
            ["items.ndjson"]
            if single_file
            else [
                {"file": f, "n_rows": n, "sha256": s}
                for _p, f, n, s in manifest
            ]
        ),
        "content_sum64": format(content_sum, "016x"),
        "content_scheme": "sum64-of-line-sha256-prefixes",
        "versions": {"pyspark": spark.version},
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(target, "metadata.json"), "w") as fh:
        json.dump(metadata, fh, sort_keys=True, indent=1)
    return metadata
