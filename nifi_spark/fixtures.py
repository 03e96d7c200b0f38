"""Deterministic synthetic fixtures: base `repos` table + `changelog` binlog.

Schemas fixed by FIXTURES.md. Two generators:

* pandas generators (``gen_repos`` / ``gen_changelog``) — seeded, used by
  pytest together with the pure-pandas replay oracle (oracle.py). These emit
  every edge case FIXTURES.md requires: same-key multi-update in one batch,
  delete→re-insert in one batch, duplicate (key,lsn) re-deliveries straddling
  batch boundaries, schema_change interleaved mid-batch, and a hot repo
  receiving ≥30% of all events (Zipf skew).
* a Spark generator (``gen_changelog_spark``) — pure column expressions over
  ``spark.range`` so benchmark inputs are produced *distributed*, with no
  driver-side bottleneck. At 10^10 events on a real cluster this is the only
  viable shape; the pandas path exists purely for oracle comparability.

NiFi analogs: GenerateFlowFile synthetic source
(nifi-nar-bundles/nifi-standard-bundle/nifi-standard-processors/src/main/java/
org/apache/nifi/processors/standard/GenerateFlowFile.java:1-60) and the
Derby-backed watermark tests (QueryDatabaseTableTest.java:167-250).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

LANGS = {"py": "python", "java": "java", "scala": "scala", "js": "javascript",
         "go": "go", "rs": "rust", "md": "markdown"}
_EXTS = list(LANGS)
_WORDS = ("def class import return self spark merge commit lsn batch schema "
          "table row key value hash join filter select partition bucket "
          "window agg upsert delete insert update ledger snapshot").split()

CHANGELOG_COLUMNS = ["lsn", "op", "repo", "path", "commit", "lang", "content",
                     "ts", "sc_kind", "sc_column", "sc_new_name", "sc_dtype"]


def _sha1(s: str) -> str:
    return hashlib.sha1(s.encode()).hexdigest()


def _content(repo: str, path: str, version: int, rng: np.random.RandomState,
             min_chars: int = 200, max_chars: int = 2048) -> str:
    """Deterministic pseudo-source for (repo, path, version)."""
    n = int(rng.randint(min_chars, max_chars))
    idx = rng.randint(0, len(_WORDS), size=max(4, n // 6))
    body = " ".join(_WORDS[i] for i in idx)
    return f"// {repo}/{path}@v{version}\n{body}"[:max(n, 64)]


def _keyspace(n_repos: int, paths_per_repo: int, seed: int,
              zipf_s: float = 1.2) -> tuple[list[tuple[str, str]], np.ndarray]:
    """All (repo, path) keys + a Zipf weight per key so one repo is hot."""
    rng = np.random.RandomState(seed)
    n_orgs = max(1, n_repos // 10)
    keys: list[tuple[str, str]] = []
    for r in range(n_repos):
        repo = f"org{r % n_orgs}/repo{r}"
        for p in range(paths_per_repo):
            depth = 1 + (p % 4)
            pkg = "/".join(f"pkg{(p + d) % 7}" for d in range(depth))
            ext = _EXTS[(r + p) % len(_EXTS)]
            keys.append((repo, f"src/{pkg}/mod{p}.{ext}"))
    # Zipf over repos → weight per key; repo0 becomes the hot repo.
    repo_rank = np.arange(1, n_repos + 1, dtype=np.float64)
    repo_w = repo_rank ** (-zipf_s)
    repo_w /= repo_w.sum()
    w = np.repeat(repo_w, paths_per_repo)
    w /= w.sum()
    rng.shuffle(repo_rank)  # keep rng state deterministic usage
    return keys, w


def gen_repos(n_repos: int = 50, paths_per_repo: int = 20, seed: int = 42,
              min_chars: int = 200, max_chars: int = 2048) -> pd.DataFrame:
    """Base target table (repo, path, commit, lang, content) — input_hint shape."""
    keys, _ = _keyspace(n_repos, paths_per_repo, seed)
    rng = np.random.RandomState(seed + 1)
    rows = []
    for repo, path in keys:
        ext = path.rsplit(".", 1)[-1]
        rows.append({
            "repo": repo, "path": path,
            "commit": _sha1(f"{repo}/{path}@0"),
            "lang": LANGS[ext],
            "content": _content(repo, path, 0, rng, min_chars, max_chars),
        })
    return pd.DataFrame(rows)


def gen_changelog(n_events: int = 10_000, n_repos: int = 50,
                  paths_per_repo: int = 20, seed: int = 42,
                  op_mix: tuple[float, float, float, float] = (0.30, 0.50, 0.18, 0.02),
                  dup_rate: float = 0.01, zipf_s: float = 1.2,
                  min_chars: int = 64, max_chars: int = 512) -> pd.DataFrame:
    """Ordered change-event log (synthetic binlog/WAL).

    Row order is delivery order; `lsn` is the logical sequence (strictly
    increasing for first deliveries; duplicate re-deliveries repeat an
    earlier lsn later in the file). Ops: insert | update | delete |
    schema_change.
    """
    keys, w = _keyspace(n_repos, paths_per_repo, seed, zipf_s)
    rng = np.random.RandomState(seed + 2)
    n_keys = len(keys)
    key_idx = rng.choice(n_keys, size=n_events, p=w)
    op_draw = rng.rand(n_events)
    c_ins, c_upd, c_del, _ = np.cumsum(op_mix)
    version = np.zeros(n_keys, dtype=np.int64)
    alive = np.zeros(n_keys, dtype=bool)
    base_ts = pd.Timestamp("2024-01-01", tz=None)

    extra_cols: list[str] = []
    sc_counter = 0
    rows = []
    for i in range(n_events):
        lsn = i
        ts = base_ts + pd.Timedelta(seconds=i * 3 + int(rng.randint(0, 3)))
        d = op_draw[i]
        if d >= c_del:  # schema_change
            sc_counter += 1
            if extra_cols and sc_counter % 3 == 0:
                old = extra_cols[int(rng.randint(0, len(extra_cols)))]
                new = old + "r"
                extra_cols[extra_cols.index(old)] = new
                sc = ("rename_column", old, new, "string")
            else:
                name = f"extra_{sc_counter}"
                extra_cols.append(name)
                sc = ("add_column", name, None, "string")
            rows.append((lsn, "schema_change", None, None, None, None, None,
                         ts, *sc))
            continue
        k = int(key_idx[i])
        repo, path = keys[k]
        if d < c_ins or not alive[k]:
            op = "insert" if not alive[k] else "update"
            alive[k] = True
        elif d < c_upd:
            op = "update"
        else:
            op = "delete"
        if op == "delete":
            alive[k] = False
            rows.append((lsn, "delete", repo, path, None, None, None, ts,
                         None, None, None, None))
        else:
            version[k] += 1
            v = int(version[k])
            ext = path.rsplit(".", 1)[-1]
            lang = LANGS[ext] if v % 5 else "text"  # lang can change on update
            rows.append((lsn, op, repo, path, _sha1(f"{repo}/{path}@{v}"),
                         lang, _content(repo, path, v, rng, min_chars, max_chars),
                         ts, None, None, None, None))

    df = pd.DataFrame(rows, columns=CHANGELOG_COLUMNS)

    # --- deterministic edge-case injection -------------------------------
    # (a) duplicate re-deliveries: re-emit ~dup_rate of already-applied
    # (key,lsn) rows later in the file (same lsn — at-least-once delivery).
    n_dups = max(2, int(n_events * dup_rate))
    dup_src = rng.choice(len(df), size=n_dups, replace=False)
    dup_rows = df.iloc[np.sort(dup_src)].copy()
    # place half soon after the original (same batch), half near the end
    # (straddles batch boundaries on any split).
    df = pd.concat([df, dup_rows], ignore_index=True)
    order = np.arange(len(df))
    half = n_dups // 2
    for j, src_pos in enumerate(np.sort(dup_src)):
        dup_pos = n_events + j
        if j < half:
            target = min(src_pos + 3, n_events - 1)
            order[dup_pos] = target  # stable sort keeps it after originals
    df = df.iloc[np.argsort(order, kind="stable")].reset_index(drop=True)
    return df


def batch_bounds(changelog: pd.DataFrame, n_batches: int) -> list[int]:
    """Split points (inclusive max lsn per batch) for resumability tests."""
    max_lsn = int(changelog["lsn"].max())
    step = (max_lsn + 1) // n_batches
    bounds = [step * (i + 1) - 1 for i in range(n_batches - 1)] + [max_lsn]
    return bounds


def write_changelog_parquet(changelog: pd.DataFrame, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    schema = pa.schema([
        ("lsn", pa.int64()), ("op", pa.string()), ("repo", pa.string()),
        ("path", pa.string()), ("commit", pa.string()), ("lang", pa.string()),
        ("content", pa.string()), ("ts", pa.timestamp("us")),
        ("sc_kind", pa.string()), ("sc_column", pa.string()),
        ("sc_new_name", pa.string()), ("sc_dtype", pa.string()),
    ])
    pq.write_table(pa.Table.from_pandas(changelog, schema=schema,
                                        preserve_index=False), path)


# --------------------------------------------------------------------------
# Distributed generator for benchmarks: pure column expressions, no driver
# loop — this is how a 10^10-event binlog is synthesized on a real cluster.
# --------------------------------------------------------------------------

def gen_changelog_spark(spark, n_events: int, n_repos: int = 5000,
                        paths_per_repo: int = 40, content_chars: int = 256,
                        partitions: int | None = None):
    """Changelog as a deterministic function of lsn, generated distributed.

    Every column derives from `id` via hash expressions, so generation
    parallelizes perfectly and is reproducible without any seed state.
    """
    from pyspark.sql import functions as F

    parts = partitions or spark.sparkContext.defaultParallelism * 2
    n_keys = n_repos * paths_per_repo
    df = spark.range(0, n_events, 1, parts).withColumnRenamed("id", "lsn")
    h = F.abs(F.xxhash64(F.col("lsn")))
    # Zipf-ish skew: ~30% of events hit repo 0 (the hot repo), rest uniform.
    key_id = F.when((h % 100) < 30, (h % paths_per_repo)) \
              .otherwise(h % F.lit(n_keys))
    df = df.withColumn("key_id", key_id)
    repo = F.concat(F.lit("org"), (F.col("key_id") / paths_per_repo).cast("long") % (n_repos // 10),
                    F.lit("/repo"), (F.col("key_id") / paths_per_repo).cast("long"))
    path = F.concat(F.lit("src/pkg"), F.col("key_id") % 7, F.lit("/mod"),
                    F.col("key_id") % paths_per_repo, F.lit(".py"))
    opsel = F.abs(F.xxhash64(F.col("lsn"), F.lit(1))) % 100
    op = (F.when(opsel < 30, "insert").when(opsel < 80, "update")
           .when(opsel < 98, "delete").otherwise("update"))
    pad = "x" * content_chars
    content = F.concat(F.lit("// "), repo, F.lit("/"), path, F.lit("@"),
                       F.col("lsn").cast("string"), F.lit("\n"), F.lit(pad))
    return (df
            .withColumn("op", op)
            .withColumn("repo", repo)
            .withColumn("path", path)
            .withColumn("commit", F.sha1(F.concat(repo, path, F.col("lsn").cast("string"))))
            .withColumn("lang", F.lit("python"))
            .withColumn("content", F.when(F.col("op") != "delete", content))
            .withColumn("ts", F.timestamp_seconds(F.lit(1704067200) + F.col("lsn") % 86400))
            .withColumn("sc_kind", F.lit(None).cast("string"))
            .withColumn("sc_column", F.lit(None).cast("string"))
            .withColumn("sc_new_name", F.lit(None).cast("string"))
            .withColumn("sc_dtype", F.lit(None).cast("string"))
            .drop("key_id"))
