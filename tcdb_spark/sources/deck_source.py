"""Custom Python DataSource for deck-file listing ingestion (Spark 4
``pyspark.sql.datasource`` API) — the engine-native half of the
reference's HTTP-listing pipelines (tcdb/pipeline/adeck.py:20-38,
bdeck.py:23-39: scrape the index page, filter names by pattern,
download each file, parse).

Mapping onto Spark's source contract:

- the LISTING runs once at planning time on the driver (exactly where
  Spark's own FileIndex lists) and becomes the partition set — one
  partition per deck file, so a 10k-file basin season fans out to 10k
  parallel tasks with no driver-side download loop;
- each partition's READ runs on an executor and yields
  ``(path, mtime, line_no, line)`` rows; ``.gz`` members stream through
  gzip the way the reference's downloads do;
- name filtering (the reference's regex over index hrefs) is the
  ``pattern`` option, applied at listing time, so excluded files are
  never opened.

The HTTP variant is this same reader with a urllib listing/opener; no
network exists in this image, so the filesystem is the tested backend
and the swap point is documented on ``DeckReader`` (the reference
separates listing from parsing the same way).

Downstream, ``line``/``path`` feed the existing column-expression deck
parsers (sources/atcf.py) unchanged — the source only owns listing,
distribution, and decompression.
"""

from __future__ import annotations

import datetime as dt
import glob
import gzip
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

# Manifest format marker: present -> written by the merge-on-append
# writer (complete, safe to trust strictly); absent -> legacy pre-merge
# manifest that may under-name published parts (readers ignore it).
MANIFEST_VERSION_HEADER = "#v2"


class DeckFilePartition(InputPartition):
    def __init__(self, path: str, mtime: float):
        self.path = path
        self.mtime = mtime


def _is_http(path: str) -> bool:
    return path.startswith(("http://", "https://"))


class DeckReader(DataSourceReader):
    """One partition per matched file; listing happens here (driver,
    planning time).  ``path`` may be a filesystem directory or an
    ``http(s)://`` index URL — the HTTP backend is the reference's
    scrape-index-then-download pipeline (tcdb/pipeline/adeck.py:20-38):
    the driver fetches ONE index page to learn the names (hrefs of an
    autoindex page, or a plain-text name-per-line listing), and each
    file downloads executor-side in its own partition — 10k deck files
    fan out to 10k parallel downloads with no driver loop, which is the
    shape that matters when the archive is large.  Exercised against a
    loopback http.server in tests (no external network in CI)."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("deckdir source requires .option('path', <dir>)")
        self.path = path
        self.pattern = options.get("pattern", "*.dat*")

    def _list(self) -> list[tuple[str, float]]:
        if _is_http(self.path):
            return self._list_http()
        matched = sorted(glob.glob(os.path.join(self.path, self.pattern)))
        files = [p for p in matched if os.path.isfile(p)]
        # If a VERSIONED _MANIFEST exists the directory is writer-managed:
        # read only the files it names, so a reader racing a concurrent
        # commit (or landing after a partial publish) never sees
        # unpublished parts.  The "#v2" header marks manifests written by
        # the merge-on-append writer, which are always COMPLETE.
        #
        # Compat (round-3 ADVICE): a header-less manifest came from the
        # pre-merge writer, whose append-mode commits overwrote it with
        # only the last job's files — trusting it would silently drop
        # previously published parts.  Those directories fall back to the
        # full listing (treated as unmanaged legacy output).  A
        # coverage-based fallback would be wrong instead: commit renames
        # part files BEFORE swapping the manifest, so a racing reader
        # always sees momentarily-uncovered parts.
        manifest = os.path.join(self.path, "_MANIFEST")
        if os.path.isfile(manifest):
            with open(manifest) as f:
                lines = [ln.strip() for ln in f if ln.strip()]
            if lines and lines[0] == MANIFEST_VERSION_HEADER:
                named = set(lines[1:])
                files = [p for p in files if os.path.basename(p) in named]
        return [(p, os.path.getmtime(p)) for p in files]

    def _list_http(self) -> list[tuple[str, float]]:
        """One index-page fetch (the reference's href scrape) -> the
        partition set.  mtime is resolved per file at read time from the
        Last-Modified header (a HEAD per file here would put N driver
        round-trips back on the critical path)."""
        import fnmatch
        import re
        import urllib.request

        base = self.path if self.path.endswith("/") else self.path + "/"
        with urllib.request.urlopen(base, timeout=30) as r:
            body = r.read().decode("utf-8", "replace")
        # autoindex page: relative hrefs; otherwise a plain-text listing
        names = set(re.findall(r'href="([^"?/][^"]*)"', body))
        if not names:
            names = {ln.strip() for ln in body.splitlines() if ln.strip()}
        return [
            (base + n, 0.0)
            for n in sorted(names)
            if fnmatch.fnmatch(n, self.pattern)
        ]

    def partitions(self):
        return [DeckFilePartition(p, m) for p, m in self._list()]

    def read(self, partition: DeckFilePartition):
        if _is_http(partition.path):
            yield from self._read_http(partition)
            return
        mtime = dt.datetime.fromtimestamp(partition.mtime, tz=dt.timezone.utc)
        mtime = mtime.replace(tzinfo=None)
        opener = gzip.open if partition.path.endswith(".gz") else open
        with opener(partition.path, "rt") as f:
            for i, line in enumerate(f):
                yield (partition.path, mtime, i + 1, line.rstrip("\r\n"))

    def _read_http(self, partition: DeckFilePartition):
        """Executor-side download of one deck member (the distributed
        form of the reference's per-file download loop)."""
        import email.utils
        import urllib.request

        with urllib.request.urlopen(partition.path, timeout=60) as r:
            lm = r.headers.get("Last-Modified")
            data = r.read()
        if lm:
            mtime = email.utils.parsedate_to_datetime(lm)
            mtime = mtime.astimezone(dt.timezone.utc).replace(tzinfo=None)
        else:
            mtime = dt.datetime(1970, 1, 1)
        if partition.path.endswith(".gz"):
            data = gzip.decompress(data)
        for i, line in enumerate(data.decode("utf-8", "replace").splitlines()):
            yield (partition.path, mtime, i + 1, line.rstrip("\r"))


class DeckDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "deckdir"

    def schema(self) -> str:
        return "path string, mtime timestamp, line_no int, line string"

    def reader(self, schema) -> DeckReader:
        return DeckReader(self.options)

    def writer(self, schema, overwrite: bool) -> "DeckWriter":
        return DeckWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent session registration:
    ``spark.read.format('deckdir').option('path', dir).load()``."""
    spark.dataSource.register(DeckDataSource)


class DeckCommitMessage(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class DeckWriter(DataSourceWriter):
    """Writer half of the custom source: one deck text file per
    partition, written executor-side (the distributed form of the
    reference's file-per-group sink loops, db/sql_export.py:19-28).

    Commit protocol: each task writes ``part-<partition>-<attempt>-<job>``
    to a hidden staging name and reports it in its commit message; the
    driver's ``commit`` publishes a ``_MANIFEST`` naming exactly the
    readable files (merging the previous manifest in append mode), so
    manifest-aware readers never see half-written output — the same
    files-then-pointer discipline as the versioned warehouse. The
    ``<job>`` uuid makes names collision-free across Spark applications
    (task attempt ids restart at 0 per app); commit/abort sweep this
    job's leftover ``.staged-*`` files from failed attempts.
    ``line_col`` selects the string column to emit; ``gz`` compresses
    members like real deck archives.
    """

    def __init__(self, options: dict, overwrite: bool):
        import uuid

        self.dir = options["path"]
        self.line_col = options.get("line_col", "line")
        self.gz = options.get("gz", "false").lower() == "true"
        self.overwrite = overwrite
        self.job_id = uuid.uuid4().hex[:12]  # driver-side; shared by all tasks
        if overwrite and os.path.isdir(self.dir):
            for f in glob.glob(os.path.join(self.dir, "*")):
                if os.path.isfile(f):  # leave subdirectories alone
                    os.remove(f)
        os.makedirs(self.dir, exist_ok=True)

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, att = ctx.partitionId(), ctx.taskAttemptId()
        ext = ".dat.gz" if self.gz else ".dat"
        name = f".staged-part-{pid:05d}-{att}-{self.job_id}{ext}"
        path = os.path.join(self.dir, name)
        opener = gzip.open if self.gz else open
        n = 0
        with opener(path, "wt") as f:
            for row in iterator:
                f.write(getattr(row, self.line_col) + "\n")
                n += 1
        if n == 0:
            os.remove(path)
            return DeckCommitMessage("", 0)
        return DeckCommitMessage(path, n)

    def _sweep_staged(self, keep: set[str]) -> None:
        """Remove THIS job's leftover staged files (failed/zombie task
        attempts). Scoped by job_id so a concurrent writer's staging is
        untouched."""
        for f in glob.glob(os.path.join(self.dir, f".staged-*-{self.job_id}.dat*")):
            if f not in keep and os.path.isfile(f):
                os.remove(f)

    def commit(self, messages):
        final = []
        for m in messages:
            if not m.path:
                continue
            pub = os.path.join(
                self.dir, os.path.basename(m.path).removeprefix(".staged-")
            )
            os.replace(m.path, pub)
            final.append(os.path.basename(pub))
        self._sweep_staged(keep=set())
        if not self.overwrite:
            # append mode: the manifest must keep naming every previously
            # published file that still exists, or readers would drop them
            prev = os.path.join(self.dir, "_MANIFEST")
            if os.path.isfile(prev):
                with open(prev) as f:
                    final.extend(
                        ln.strip()
                        for ln in f
                        if ln.strip()
                        and ln.strip() != MANIFEST_VERSION_HEADER
                        and os.path.isfile(os.path.join(self.dir, ln.strip()))
                    )
        tmp = os.path.join(self.dir, "_MANIFEST.tmp")
        with open(tmp, "w") as f:
            f.write(MANIFEST_VERSION_HEADER + "\n")
            f.write("\n".join(sorted(set(final))) + "\n")
        os.replace(tmp, os.path.join(self.dir, "_MANIFEST"))

    def abort(self, messages):
        for m in messages:
            if m.path and os.path.exists(m.path):
                os.remove(m.path)
        self._sweep_staged(keep=set())
