"""Named, versioned centroid sets shared across the three semantic-dedup
surfaces (ingest signature store, streaming accept loop, batch
incremental queries).

Why a registry (r11 verdict #6): cells from different centroid sets are
incomparable, and every surface so far pinned its centroids structurally
— the ingest store carried them inline in the signature spec, a stream
captured them at start. Nothing NAMED a centroid set, so a re-fit
silently orphaned every stored cell assignment: a consumer pairing a
new batch (assigned under centroids B) against a store accepted under
centroids A gets well-typed, silently-wrong candidate cells. The
registry gives a centroid set a (name, version) identity, persists the
vectors beside it, and lets every surface stamp and verify the version.

Layout (plain files — same local-Path scope as the lifecycle tasks):

    <registry>/<name>/<version>/vectors.parquet   (centroid_id, vector)
    <registry>/<name>/CURRENT                     text file: the version

The version is content-derived (md5 over the canonical (cid, float-hex)
list, 12 hex chars), so registering the same vectors twice is a no-op,
two independently-fitted sets can never collide into one version, and
``load_centroids`` re-derives the hash from what it read — a corrupted
or hand-edited vectors file fails loudly instead of assigning wrong
cells. CURRENT moves atomically (write-temp + rename).

Stamping: the ingest ``semantic_cells`` signature store and the
streaming accepted store write a ``__centroid_version`` column; the
incremental pairing operator verifies any stamped input against the
centroids it was handed (``check_version``) before joining. The stamp
is a column, not a marker file, so it survives every lifecycle move
(archive/restore/move rewrite partitions wholesale) and rides along in
both store layouts.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")


def _canonical_pairs(centroids, vec_col: str = "embedding") -> list:
    from coolplaydruid_spark.operators.dedup import _centroid_pairs

    return _centroid_pairs(centroids, vec_col)


def _jcid(cid):
    """Canonical JSON-able cid preserving the int/str distinction —
    the cid TYPE is part of the identity because it decides the
    ``__cell`` column type (a long-cid store and a string-cid store
    would join on incomparable keys even with equal-looking values)."""
    return cid if isinstance(cid, str) else int(cid)


def centroid_version(centroids, vec_col: str = "embedding") -> str:
    """Content hash of a centroid set: md5 over the canonical
    (cid, vector) list with vectors rendered as float64 hex (exact —
    no repr/locale wobble) and cids kept typed (_jcid), truncated to
    12 hex chars. Pairs are SORTED by cid first: assignment semantics
    are order-independent (ties break on the cid VALUE, not position),
    so two orderings of the same set are the same version — and the
    registry's read-back order can never false-trip the tamper check."""
    pairs = _canonical_pairs(centroids, vec_col)
    payload = json.dumps(
        sorted([_jcid(cid), [float(x).hex() for x in vec]]
               for cid, vec in pairs),
        separators=(",", ":"),
    )
    return hashlib.md5(payload.encode()).hexdigest()[:12]


def register_centroids(spark: SparkSession, registry: str, name: str,
                       centroids, vec_col: str = "embedding") -> str:
    """Persist a centroid set under ``name`` and point CURRENT at it;
    returns the content-derived version. Idempotent per content: the
    same vectors re-register as the same version (vectors are not
    rewritten); DIFFERENT vectors under the same name create a new
    version and move CURRENT — old versions stay readable, so stores
    stamped with them keep loading."""
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid centroid-set name {name!r}")
    pairs = _canonical_pairs(centroids, vec_col)
    version = centroid_version(pairs, vec_col)
    vdir = Path(registry) / name / version
    if not (vdir / "vectors.parquet").exists():
        # cid type round-trips: a long-cid set must load back long (it
        # decides the __cell column type downstream)
        cid_t = "string" if any(isinstance(c, str) for c, _ in pairs) \
            else "long"
        spark.createDataFrame(
            [(_jcid(cid), [float(x) for x in vec]) for cid, vec in pairs],
            f"centroid_id {cid_t}, {vec_col} array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(vdir / "vectors.parquet"))
    tmp = Path(registry) / name / f".CURRENT.{os.getpid()}"
    tmp.write_text(version)
    tmp.replace(Path(registry) / name / "CURRENT")
    return version


def current_version(registry: str, name: str) -> str:
    cur = Path(registry) / name / "CURRENT"
    if not cur.is_file():
        raise ValueError(
            f"centroid set {name!r} is not registered under {registry!r}")
    return cur.read_text().strip()


def load_centroids(spark: SparkSession, registry: str, name: str,
                   version: str | None = None,
                   vec_col: str = "embedding"):
    """Load a registered centroid set; returns (pairs, version).
    ``version=None`` resolves CURRENT. The hash is RE-DERIVED from the
    vectors read back and must equal the version directory's name —
    a tampered/corrupted set fails here, not downstream with wrong
    cells."""
    version = version or current_version(registry, name)
    vpath = Path(registry) / name / version / "vectors.parquet"
    if not vpath.exists():
        raise ValueError(
            f"centroid set {name!r} version {version!r} not found under "
            f"{registry!r}")
    rows = spark.read.parquet(str(vpath)).collect()
    pairs = sorted(
        ((r["centroid_id"], list(r[vec_col])) for r in rows),
        key=lambda p: p[0],
    )
    got = centroid_version(pairs, vec_col)
    if got != version:
        raise ValueError(
            f"centroid set {name!r}: stored vectors hash to {got!r} but "
            f"the version directory says {version!r} — the set was "
            "modified after registration; re-register it")
    return pairs, version


def resolve_centroids(spark: SparkSession, centroids,
                      vec_col: str = "embedding"):
    """Normalize any accepted centroid argument to (pairs, version).
    A dict ``{"registry": ..., "name": ..., "version": ...?}`` loads
    from the registry (version defaults to CURRENT — resolved ONCE
    here, so a long-lived consumer is pinned, not floating); any other
    form (DataFrame / (cid, vec) list / bare vectors) passes through
    with its content-derived version."""
    if isinstance(centroids, dict):
        return load_centroids(
            spark, centroids["registry"], centroids["name"],
            centroids.get("version"), vec_col=vec_col)
    pairs = _canonical_pairs(centroids, vec_col)
    return pairs, centroid_version(pairs, vec_col)


def check_version(frame: DataFrame, expected: str, what: str = "store") -> None:
    """Verify a ``__centroid_version``-stamped frame was assigned under
    ``expected``. Bounded probe (distinct limit 2 over one
    dictionary-encoded column): raises on a mismatched OR mixed-version
    store — both mean some stored cells are incomparable with the
    centroids in hand. No-op for unstamped frames (pre-registry
    stores)."""
    if "__centroid_version" not in frame.columns:
        return
    from pyspark.sql import functions as F

    # NULL stamps (pre-registry rows) are filtered BEFORE the bounded
    # limit(2) probe (r12 advice): a store holding {NULL, v1, v2} could
    # otherwise satisfy the limit with {NULL, v1}, hiding v2 and letting
    # the mixed-version error — the exact hazard this guard exists for —
    # silently not fire.
    vals = sorted(
        r[0] for r in
        frame.where(F.col("__centroid_version").isNotNull())
        .select("__centroid_version").distinct().limit(2).collect()
    )
    if len(vals) > 1:
        raise ValueError(
            f"{what} holds cells from MULTIPLE centroid versions "
            f"{vals} — it was appended under different centroid sets; "
            "rebuild it under one version (signature_task / stream "
            "replay)")
    if vals and vals[0] != expected:
        raise ValueError(
            f"{what} was assigned under centroid version {vals[0]!r} "
            f"but the centroids in hand are {expected!r} — cells from "
            "different centroid sets are incomparable; load the "
            "matching version from the registry or rebuild the store")
