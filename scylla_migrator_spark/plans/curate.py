"""Config-driven corpus curation: the analytics twin of the migration
pipeline (plans/migrate.py) — a YAML stage list composed into ONE declarative
DataFrame plan, with per-stage survivor counts observed on the single output
action.

    source: {type: parquet, path: /data/documents.parquet}
    idColumn: doc_id
    textColumn: text
    stages:
      - {op: length_filter, minTokens: 20}
      - {op: quality_filter, minAlphaRatio: 0.5}
      - {op: lang_filter, allow: [en, es]}
      - {op: pii_redact}
      - {op: repetition_filter, maxTopBigramFrac: 0.2}
      - {op: intra_doc_repetition_filter, maxDupFrac: 0.5}
      - {op: exact_dedup}
    target: {type: parquet, path: /out/curated}

Scale design:
* every row-level stage is a column predicate composed into the scan stage
  (no intermediate materialization, no Python); `exact_dedup` is the one
  join stage (digest-keyed keeper semi-join, shuffle carries digests);
* per-stage counts use ``pyspark.sql.Observation`` — they ride the SINGLE
  output action instead of one count() job per stage, so auditing a
  10-stage pipeline costs zero extra passes at 100 TB;
* unknown ops / bad params fail at DECODE time (ConfigError), before any
  cluster time is spent — the same posture as MigratorConfig.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from scylla_migrator_spark.analytics import dedup as D
from scylla_migrator_spark.analytics import text as TXT
from scylla_migrator_spark.config import ConfigError


def _require_number(params: dict, key: str, lo: float, hi: float) -> float:
    v = params.get(key)
    if not isinstance(v, (int, float)) or isinstance(v, bool) or not lo <= v <= hi:
        raise ConfigError(
            f"stage param {key!r} must be a number in [{lo}, {hi}], got {v!r}"
        )
    return float(v)


def _reject_extras(params: dict, known: set[str]) -> None:
    """Fail-at-decode on unknown/misspelled keys — a typo'd maxToken that is
    silently ignored means the cap never applies and bad rows flow through."""
    extra = set(params) - known - {"op"}
    if extra:
        raise ConfigError(f"unexpected params {sorted(extra)} for {params['op']}")


# op -> (required/optional param validator). Each returns a normalized dict.
def _v_length(params: dict) -> dict:
    _reject_extras(params, {"minTokens", "maxTokens"})
    out = {}
    if "minTokens" not in params and "maxTokens" not in params:
        raise ConfigError("length_filter needs minTokens and/or maxTokens")
    if "minTokens" in params:
        out["min_tokens"] = int(_require_number(params, "minTokens", 0, 1e9))
    if "maxTokens" in params:
        out["max_tokens"] = int(_require_number(params, "maxTokens", 0, 1e9))
    if out.get("min_tokens", 0) > out.get("max_tokens", 10**18):
        raise ConfigError("length_filter: minTokens > maxTokens drops every row")
    return out


def _v_quality(params: dict) -> dict:
    _reject_extras(params, {"minAlphaRatio"})
    return {"min_alpha_ratio": _require_number(params, "minAlphaRatio", 0.0, 1.0)}


def _v_lang(params: dict) -> dict:
    _reject_extras(params, {"allow"})
    allow = params.get("allow")
    if (
        not isinstance(allow, list)
        or not allow
        or not all(isinstance(x, str) for x in allow)
    ):
        raise ConfigError("lang_filter needs allow: [<lang>, ...]")
    return {"allow": allow}


def _v_repetition(params: dict) -> dict:
    _reject_extras(params, {"maxTopBigramFrac"})
    return {"max_frac": _require_number(params, "maxTopBigramFrac", 0.0, 1.0)}


def _v_intra_dup(params: dict) -> dict:
    _reject_extras(params, {"maxDupFrac", "windowTokens"})
    out = {"max_frac": _require_number(params, "maxDupFrac", 0.0, 1.0)}
    if "windowTokens" in params:
        out["n"] = int(_require_number(params, "windowTokens", 1, 1000))
    return out


def _v_empty(params: dict) -> dict:
    _reject_extras(params, set())
    return {}


def _v_near_dedup(params: dict) -> dict:
    _reject_extras(params, {"numHashes", "bands", "withinWatermark"})
    # upper bound = the size of the shared affine hash family (text.py
    # AFFINE_COEFFS): a larger request would pass decode and then fail at
    # plan build with an unresolved-column error
    out = {
        "num_hashes": int(_require_number(params, "numHashes", 4, 64))
        if "numHashes" in params
        else 16,
        "bands": int(_require_number(params, "bands", 1, 64))
        if "bands" in params
        else 4,
    }
    if out["num_hashes"] % out["bands"] != 0:
        raise ConfigError("near_dedup: numHashes must be divisible by bands")
    # streaming only: the state-retention horizon for the watermarked
    # signature-dedup gate. The batch pipeline is corpus-global and
    # ignores it (strictly stronger semantics).
    if "withinWatermark" in params:
        ww = params["withinWatermark"]
        if not isinstance(ww, str) or not ww.strip():
            raise ConfigError(
                "near_dedup: withinWatermark must be a delay string "
                "like '1 hour'"
            )
        out["within_watermark"] = ww
    return out


def _v_exact_dedup(params: dict) -> dict:
    _reject_extras(params, {"withinWatermark"})
    out: dict = {}
    # streaming only: the state horizon for the watermarked digest-dedup
    # gate; the batch pipeline is corpus-global and ignores it
    if "withinWatermark" in params:
        ww = params["withinWatermark"]
        if not isinstance(ww, str) or not ww.strip():
            raise ConfigError(
                "exact_dedup: withinWatermark must be a delay string "
                "like '1 hour'"
            )
        out["within_watermark"] = ww
    return out


def _v_history_bloom(params: dict) -> dict:
    _reject_extras(params, {"historyPath", "numBits", "numHashes", "digestColumn"})
    hp = params.get("historyPath")
    if not isinstance(hp, str) or not hp.strip():
        raise ConfigError("history_bloom_dedup needs historyPath: <parquet dir>")
    out: dict = {"history_path": hp}
    out["num_bits"] = (
        int(_require_number(params, "numBits", 64, 16_777_216))
        if "numBits" in params
        else 8192
    )
    out["num_hashes"] = (
        int(_require_number(params, "numHashes", 1, 8))
        if "numHashes" in params
        else 3
    )
    if "digestColumn" in params:
        dc = params["digestColumn"]
        if not isinstance(dc, str) or not dc.strip():
            raise ConfigError(
                "history_bloom_dedup: digestColumn must be a column name"
            )
        out["digest_column"] = dc
    return out


def _v_readability(params: dict) -> dict:
    _reject_extras(params, {"minFlesch", "maxFlesch"})
    out = {}
    if "minFlesch" not in params and "maxFlesch" not in params:
        raise ConfigError("readability_filter needs minFlesch and/or maxFlesch")
    if "minFlesch" in params:
        out["min_flesch"] = _require_number(params, "minFlesch", -1e4, 1e4)
    if "maxFlesch" in params:
        out["max_flesch"] = _require_number(params, "maxFlesch", -1e4, 1e4)
    if out.get("min_flesch", -1e18) > out.get("max_flesch", 1e18):
        raise ConfigError("readability_filter: minFlesch > maxFlesch drops every row")
    return out


def _v_diversity(params: dict) -> dict:
    _reject_extras(params, {"minTTR"})
    return {"min_ttr": _require_number(params, "minTTR", 0.0, 1.0)}


def _v_kn_perplexity(params: dict) -> dict:
    _reject_extras(params, {"maxAvgNll", "discount"})
    out = {"max_avg_nll": _require_number(params, "maxAvgNll", 0.0, 100.0)}
    if "discount" in params:
        out["discount"] = _require_number(params, "discount", 0.0, 1.0)
    return out


_OPS: dict[str, Any] = {
    "length_filter": _v_length,
    "quality_filter": _v_quality,
    "lang_filter": _v_lang,
    "pii_redact": _v_empty,
    "repetition_filter": _v_repetition,
    "intra_doc_repetition_filter": _v_intra_dup,
    "exact_dedup": _v_exact_dedup,
    "near_dedup": _v_near_dedup,
    "gopher_filter": _v_empty,
    "readability_filter": _v_readability,
    "diversity_filter": _v_diversity,
    "history_bloom_dedup": _v_history_bloom,
    "kn_perplexity_filter": _v_kn_perplexity,
}


def _history_bloom_gate(spark, cfg: "CurationConfig", st: dict, df: DataFrame) -> DataFrame:
    """Drop every document whose text digest MIGHT be in the historical
    corpus's Bloom bitmap (functions/bloom.py) — keep only guaranteed-novel
    rows. The bitmap is built once at compose time from ``historyPath``
    (bounded <= numBits collect) and rides the plan as a scan-stage
    predicate, so the stage is STATELESS: it works identically on a batch
    corpus and a stream, with no watermark, no state store, and no
    stream-static join. The trade: novel documents are also dropped at the
    bitmap's false-positive rate — size ``numBits`` for the acceptable
    novel-loss (cf. the stream_bloom_history_gate query, which measures
    it)."""
    from scylla_migrator_spark.functions import bloom as B

    if "__hk" in df.columns:
        raise ConfigError(
            "history_bloom_dedup: the corpus already has a '__hk' column, "
            "which this stage uses internally; rename it"
        )
    hist = spark.read.parquet(st["history_path"])
    if "digest_column" in st:
        if st["digest_column"] not in hist.columns:
            raise ConfigError(
                f"history_bloom_dedup: digestColumn {st['digest_column']!r} "
                f"not in history table (has {hist.columns})"
            )
        keys = hist.select(F.col(st["digest_column"]).alias("__hk"))
        # the probe side hashes substring(sha2(text,256),1,16); a history
        # digest in any OTHER format (full 64-char sha256 is the classic
        # mistake) would set bitmap bits that never match a probe — the
        # gate would silently drop NOTHING while the sidecar claims
        # guaranteed-novel semantics. Fail loudly instead (limit-bounded
        # probe, early-exits on the first bad row).
        bad = (
            keys.where(~F.col("__hk").rlike("^[0-9a-f]{16}$")).limit(1).count()
        )
        if bad:
            raise ConfigError(
                "history_bloom_dedup: digestColumn values must be the "
                "16-char lowercase-hex prefix of sha2(text, 256) "
                "(substring(sha2(text, 256), 1, 16)) — found a value in "
                "another format, which would silently match nothing"
            )
    else:
        if cfg.text_column not in hist.columns:
            raise ConfigError(
                f"history_bloom_dedup: history table has no text column "
                f"{cfg.text_column!r} (set digestColumn for precomputed "
                f"digests; table has {hist.columns})"
            )
        keys = hist.select(
            F.substring(F.sha2(F.col(cfg.text_column), 256), 1, 16).alias("__hk")
        )
    # no keys.distinct(): build_bloom_bitmap already distincts the
    # <= num_bits BIT POSITIONS with map-side combine, so a pre-distinct
    # of the digests would add an O(|history|) exchange for nothing
    words = B.build_bloom_bitmap(
        keys, "__hk",
        num_hashes=st["num_hashes"], num_bits=st["num_bits"],
    )
    probed = df.withColumn(
        "__hk", F.substring(F.sha2(F.col(cfg.text_column), 256), 1, 16)
    )
    return B.bloom_prune(
        probed, "__hk", words,
        num_hashes=st["num_hashes"], num_bits=st["num_bits"], negate=True,
    ).drop("__hk")


@dataclass
class CurationConfig:
    source_path: str
    stages: list[dict]
    id_column: str = "doc_id"
    text_column: str = "text"
    lang_column: str = "lang"
    ts_column: str = "ts"
    target_path: str | None = None
    # target kind: "parquet" (plain corpus write) or "shards" (the
    # training last mile — sinks/training_manifest.write_training_shards:
    # deterministic hash-shuffle into n_shards manifest-backed files)
    target_kind: str = "parquet"
    shard_count: int | None = None
    shard_salt: str = "shuffle"

    @staticmethod
    def from_dict(raw: dict) -> "CurationConfig":
        if not isinstance(raw, dict):
            raise ConfigError("curation config must be a mapping")
        src = raw.get("source")
        if not isinstance(src, dict) or src.get("type") != "parquet" or not src.get("path"):
            raise ConfigError("source must be {type: parquet, path: ...}")
        stages_raw = raw.get("stages")
        if not isinstance(stages_raw, list) or not stages_raw:
            raise ConfigError("stages must be a non-empty list")
        stages = []
        for i, st in enumerate(stages_raw):
            if not isinstance(st, dict) or "op" not in st:
                raise ConfigError(f"stage {i} must be a mapping with an 'op'")
            op = st["op"]
            if op not in _OPS:
                raise ConfigError(
                    f"stage {i}: unknown op {op!r} (supported: {sorted(_OPS)})"
                )
            stages.append({"op": op, **_OPS[op](st)})
        tgt = raw.get("target")
        target_path = None
        target_kind = "parquet"
        shard_count = None
        shard_salt = "shuffle"
        if tgt is not None:
            if not isinstance(tgt, dict) or tgt.get("type") not in (
                "parquet",
                "shards",
            ) or not tgt.get("path"):
                raise ConfigError(
                    "target must be {type: parquet|shards, path: ...}"
                )
            target_path = tgt["path"]
            target_kind = tgt["type"]
            if target_kind == "shards":
                n = tgt.get("nShards")
                if not isinstance(n, int) or isinstance(n, bool) or n < 1:
                    raise ConfigError(
                        "shards target needs nShards (positive integer)"
                    )
                shard_count = n
                salt = tgt.get("salt", "shuffle")
                if not isinstance(salt, str) or not salt:
                    raise ConfigError("shards target salt must be a non-empty string")
                shard_salt = salt
        return CurationConfig(
            source_path=src["path"],
            stages=stages,
            id_column=raw.get("idColumn", "doc_id"),
            text_column=raw.get("textColumn", "text"),
            lang_column=raw.get("langColumn", "lang"),
            ts_column=raw.get("tsColumn", "ts"),
            target_path=target_path,
            target_kind=target_kind,
            shard_count=shard_count,
            shard_salt=shard_salt,
        )

    @staticmethod
    def load(path: str) -> "CurationConfig":
        import yaml

        with open(path) as f:
            return CurationConfig.from_dict(yaml.safe_load(f))


@dataclass
class CurationResult:
    df: DataFrame
    observations: list[tuple[str, Observation]] = field(default_factory=list)
    # the observed frame per stage, parallel to `observations` — the
    # recount fallback for stages whose metrics were optimized away
    frames: list[tuple[str, DataFrame]] = field(default_factory=list)

    def counts(self) -> dict[str, int]:
        """Per-stage survivor counts. Valid AFTER an action on ``df`` (the
        observations ride that action — zero extra passes on the normal
        path).

        Degenerate-empty fallback: when some stage drops EVERY row, AQE's
        empty-relation re-plan can eliminate CollectMetrics nodes from the
        executed plan — Spark then completes those observations with the
        schemaless EMPTY row (on which `Observation.get` dies JVM-side and
        `getOrEmpty` NPEs), and that can hit every stage's metrics, not
        just the post-empty ones. Such stages are detected (future not
        completed within the shared poll deadline, or completed with the
        empty row — `Row.size()` is the one safe probe) and RECOUNTED with
        a per-stage count() on the retained frame, so the audit report
        stays factual (the input count of a fully-filtered corpus is its
        real size, not 0). The recount only ever runs in that degenerate
        case; a pipeline with any surviving rows never pays it."""
        import time

        deadline = time.monotonic() + 10.0
        frames = dict(self.frames)
        out: dict[str, int] = {}
        for name, obs in self.observations:
            jo = getattr(obs, "_jo", None)
            if jo is None:
                # no JVM handle (e.g. a Spark Connect Observation): the
                # degenerate-empty probe is classic-session-only; use the
                # public blocking getter as before
                out[name] = int(obs.get["rows"])
                continue
            fut = jo.future()
            while not fut.isCompleted() and time.monotonic() < deadline:
                time.sleep(0.02)
            jrow = jo.getRow() if fut.isCompleted() else None
            if jrow is not None and jrow.size() > 0:
                out[name] = int(obs.get["rows"])
            elif name in frames:
                out[name] = frames[name].count()
            else:  # pragma: no cover - _observe appends both in lockstep
                raise RuntimeError(
                    f"observation {name!r} has no metrics and no retained "
                    "frame to recount — observations/frames desynchronized"
                )
        return out


def _stage_predicate(cfg: CurationConfig, st: dict) -> Column | None:
    """The row-level keep-predicate for a stage, or None for non-predicate
    stages (transform / join stages are applied structurally)."""
    t = F.col(cfg.text_column)
    op = st["op"]
    if op == "length_filter":
        n = TXT.token_count(t)
        pred = F.lit(True)
        if "min_tokens" in st:
            pred = pred & (n >= st["min_tokens"])
        if "max_tokens" in st:
            pred = pred & (n <= st["max_tokens"])
        return pred
    if op == "quality_filter":
        # try_divide: ANSI mode turns x/0 into an ERROR, and an empty text
        # must drop (null >= threshold is false), not kill the pipeline
        alpha = F.try_divide(
            F.length(F.regexp_replace(t, r"[^A-Za-z]", "")), F.length(t)
        )
        return alpha >= st["min_alpha_ratio"]
    if op == "lang_filter":
        return F.col(cfg.lang_column).isin(st["allow"])
    if op == "gopher_filter":
        # the published Gopher document-level rules as one scan-stage
        # predicate (text.gopher_pass); parameterless by design — the
        # thresholds are the paper's, not knobs
        return TXT.gopher_pass(t)
    if op == "repetition_filter":
        return None  # needs the per-doc bigram aggregation (join stage)
    if op == "intra_doc_repetition_filter":
        sh = TXT.shingles(t, st.get("n", 8))
        frac = F.lit(1) - F.size(F.array_distinct(sh)) / F.size(sh)
        return frac <= st["max_frac"]
    if op == "readability_filter":
        # a reading-ease BAND: very high = fragment soup, very low =
        # run-on machine text; both tails are curation targets
        fl = TXT.flesch_score(t)
        pred = F.lit(True)
        if "min_flesch" in st:
            pred = pred & (fl >= st["min_flesch"])
        if "max_flesch" in st:
            pred = pred & (fl <= st["max_flesch"])
        return pred
    if op == "diversity_filter":
        # blank text -> null TTR -> row drops, doesn't error
        return TXT.type_token_ratio(t) >= st["min_ttr"]
    return None


def curate(spark: SparkSession, cfg: CurationConfig, observe: bool = True) -> CurationResult:
    """Compose the configured stages into one DataFrame plan.

    Predicate stages fold into the scan; ``pii_redact`` rewrites the text
    column in place; ``repetition_filter`` and ``exact_dedup`` are keyed
    join stages. Stage order is the config order (e.g. redact before a
    filter sees redacted text)."""
    df = spark.read.parquet(cfg.source_path)
    result = CurationResult(df=df)

    def _observe(frame: DataFrame, name: str) -> DataFrame:
        if not observe:
            return frame
        obs = Observation(name)
        result.observations.append((name, obs))
        observed = frame.observe(obs, F.count(F.lit(1)).alias("rows"))
        result.frames.append((name, observed))
        return observed

    df = _observe(df, "stage00_input")
    for i, st in enumerate(cfg.stages, start=1):
        name = f"stage{i:02d}_{st['op']}"
        pred = _stage_predicate(cfg, st)
        if pred is not None:
            df = _observe(df.filter(pred), name)
            continue
        if st["op"] == "pii_redact":
            red = TXT.redact_pii(df, cfg.text_column, "__redacted")
            df = _observe(
                red.withColumn(cfg.text_column, F.col("__redacted")).drop(
                    "__redacted", "n_email", "n_ipv4", "n_phone"
                ),
                name,
            )
        elif st["op"] == "repetition_filter":
            # ANTI-join on the repetitive ids: documents with no bigrams at
            # all (0/1 tokens) have no repetition_stats row — a semi-join on
            # the non-repetitive set would silently drop them even though
            # they cannot be repetitive
            drop = (
                TXT.repetition_stats(df, cfg.text_column, cfg.id_column, st["max_frac"])
                .filter(F.col("is_repetitive"))
                .select(cfg.id_column)
            )
            df = _observe(df.join(drop, cfg.id_column, "left_anti"), name)
        elif st["op"] == "exact_dedup":
            df = _observe(
                D.drop_exact_duplicates(df, cfg.text_column, cfg.id_column), name
            )
        elif st["op"] == "kn_perplexity_filter":
            # CCNet-style perplexity gate: corpus-trained interpolated
            # bigram Kneser-Ney, drop documents whose mean transition NLL
            # exceeds the threshold. ANTI-join on the over-threshold ids:
            # documents with no bigrams (0/1 tokens) have no score row and
            # PASS — a perplexity gate cannot judge what it cannot score
            # (length_filter is the stage that drops stubs). The LM trains
            # on the corpus AS SEEN AT THIS STAGE (post upstream filters),
            # like the batch repetition stage.
            drop = (
                TXT.kn_doc_nll(
                    df,
                    cfg.text_column,
                    cfg.id_column,
                    discount=st.get("discount", 0.75),
                )
                .filter(F.col("avg_kn_nll") > st["max_avg_nll"])
                .select(cfg.id_column)
            )
            df = _observe(df.join(drop, cfg.id_column, "left_anti"), name)
        elif st["op"] == "near_dedup":
            # pairwise keeper rule: MinHash-LSH candidate pairs always come
            # out (id_a < id_b), so dropping every id_b keeps each document
            # iff it is the minimum among its LSH neighbors. This stays ONE
            # declarative plan (no iterative fixpoint inside the pipeline);
            # for transitive-cluster keep-best semantics run
            # dedup_components + keep-best as its own job outside curate()
            losers = (
                D.minhash_lsh_candidates(
                    df, cfg.text_column, cfg.id_column,
                    num_hashes=st["num_hashes"], bands=st["bands"],
                )
                .select(F.col("id_b").alias(cfg.id_column))
                .distinct()
            )
            df = _observe(df.join(losers, cfg.id_column, "left_anti"), name)
        elif st["op"] == "history_bloom_dedup":
            df = _observe(_history_bloom_gate(spark, cfg, st, df), name)
        else:  # pragma: no cover - validated at decode time
            raise ConfigError(f"unhandled op {st['op']}")
    result.df = df
    return result


def run_curation(spark: SparkSession, cfg: CurationConfig) -> dict[str, int]:
    """Execute the pipeline: write the curated corpus (or count it when no
    target is configured) and return per-stage survivor counts — all from
    ONE action. With a target, the audit is also persisted as
    ``_curation_report.json`` inside the output directory (leading "_":
    ignored by Spark's file listing, like parquet's _SUCCESS), so the
    curated dataset carries its own provenance."""
    result = curate(spark, cfg)
    shard_summary = None
    if cfg.target_path and cfg.target_kind == "shards":
        # the training last mile as the pipeline's terminal: the curated
        # corpus hash-shuffled into the fixed shard layout with per-shard
        # token counts; the writer's distributed write is the single
        # action the observations ride, same as the parquet path
        from scylla_migrator_spark.sinks.training_manifest import (
            write_training_shards,
        )

        out = result.df.withColumn(
            "n_tokens", TXT.token_count(F.col(cfg.text_column)).cast("long")
        )
        shard_summary = write_training_shards(
            out,
            cfg.target_path,
            key_col=cfg.id_column,
            token_count_col="n_tokens",
            n_shards=cfg.shard_count,
            salt=cfg.shard_salt,
        )
    elif cfg.target_path:
        result.df.write.mode("overwrite").parquet(cfg.target_path)
    else:
        result.df.count()
    counts = result.counts()
    # provenance sidecar through scheme-dispatched PathIO: local paths use
    # NIO, file:/s3a:/gs: etc. go through the same Hadoop FileSystem the
    # corpus write used — so the report lands next to the data everywhere
    # a connector exists, with a staged-upload atomic publish. A scheme
    # with no resolvable connector skips the sidecar (warn, don't crash
    # AFTER the corpus write succeeded).
    if cfg.target_path:
        import json
        import sys

        from scylla_migrator_spark import pathio

        # near_dedup's keeper rule is pairwise (drop every id_b of a
        # candidate pair), which is MORE aggressive than transitive-cluster
        # keep-best on chains (A~B, B~C, A!~C drops both B and C) — state
        # that in the provenance so downstream consumers of the sidecar
        # know which dedup semantics produced the corpus
        def _stage_meta(st: dict) -> dict:
            if st["op"] == "near_dedup":
                return {
                    **st,
                    "semantics": "pairwise-lower-id-keeper "
                    "(chains prune deeper than transitive-cluster keep-best; "
                    "see dedup_keep_best for cluster semantics)",
                }
            if st["op"] == "history_bloom_dedup":
                return {
                    **st,
                    "semantics": "guaranteed-novel keeper: every historical "
                    "duplicate is dropped, plus novel documents at the "
                    "bitmap false-positive rate (size numBits for the "
                    "acceptable novel loss)",
                }
            return st

        stages_meta = [_stage_meta(st) for st in cfg.stages]
        report = {
            "stages": stages_meta,
            "stage_counts": counts,
            "source": cfg.source_path,
        }
        if shard_summary is not None:
            report["shards"] = shard_summary
        try:
            io = pathio.for_path(cfg.target_path)
            io.write_utf8_atomically(
                io.join(cfg.target_path, "_curation_report.json"),
                json.dumps(report, indent=2, sort_keys=True).encode("utf-8"),
            )
        except Exception as exc:  # noqa: BLE001 - the corpus write already
            # succeeded; a failed SIDECAR (missing connector -> ValueError,
            # network/permission -> Py4JJavaError/IOError) must warn, never
            # crash the pipeline after its data was published
            print(
                f"curation: skipping _curation_report.json sidecar: {exc}",
                file=sys.stderr,
            )
    return counts


def curate_stream(stream_df: DataFrame, cfg: CurationConfig) -> DataFrame:
    """The streaming form of the curation gate: apply the config's ROW-LEVEL
    stages (predicates + pii_redact) plus the watermark-bounded
    ``near_dedup`` gate to a streaming DataFrame — the same stage
    definitions gate a batch corpus and a live ingest feed (batch/stream
    unification; cf. streaming/cdc.py for the sink half).

    Streaming dedup stages (both require ``withinWatermark``):
    ``near_dedup`` attaches the MinHash signature as a scan-stage COLUMN
    (dedup.py::minhash_signature_col — identical values to the batch
    signature) and ``dropDuplicatesWithinWatermark`` keyed on the full
    signature drops every later arrival whose signature matches an earlier
    document inside the watermark horizon (full-signature equality equals
    the batch candidate rule at ``bands: 1`` exactly; at ``bands > 1`` the
    stream gate is the CONSERVATIVE core of the banded rule — per-band
    any-match needs a second stateful operator to reassemble documents, so
    the full-recall pass stays a batch job). ``exact_dedup`` dedupes on the
    same sha2 text digest the batch stage groups on. State is one
    (digest, timestamp) entry per surviving document inside the horizon —
    bounded by the watermark, evicted by Spark.

    Corpus-global join stages (repetition_filter) — and dedup stages
    WITHOUT a watermark horizon — are still rejected at compose time, not
    a silent no-op."""
    out = stream_df
    for st in cfg.stages:
        pred = _stage_predicate(cfg, st)
        if pred is not None:
            out = out.filter(pred)
        elif st["op"] == "pii_redact":
            red = TXT.redact_pii(out, cfg.text_column, "__redacted")
            out = red.withColumn(cfg.text_column, F.col("__redacted")).drop(
                "__redacted", "n_email", "n_ipv4", "n_phone"
            )
        elif st["op"] == "history_bloom_dedup":
            # stateless scan predicate: the bitmap is built from the
            # historical corpus at compose time (a batch read), so no
            # watermark, state store, or stream-static join is needed
            out = _history_bloom_gate(stream_df.sparkSession, cfg, st, out)
        elif st["op"] in ("near_dedup", "exact_dedup"):
            if "within_watermark" not in st:
                raise ConfigError(
                    f"streaming {st['op']} needs withinWatermark: '<delay>' "
                    "(the state-retention horizon); corpus-global dedup "
                    "is a batch job"
                )
            if cfg.ts_column not in out.columns:
                raise ConfigError(
                    f"streaming {st['op']} needs event-time column "
                    f"{cfg.ts_column!r} in the stream (set tsColumn)"
                )
            if st["op"] == "near_dedup":
                sig = D.minhash_signature_col(
                    F.col(cfg.text_column), num_hashes=st["num_hashes"]
                )
                key = F.sha2(
                    F.concat_ws(",", F.transform(sig, lambda m: m.cast("string"))),
                    256,
                )
            else:
                # exact dedup within the horizon: the same digest the batch
                # exact_dedup groups on (sha2 of the raw text)
                key = F.sha2(F.col(cfg.text_column), 256)
            out = (
                out.withColumn("__sig_key", key)
                .withWatermark(cfg.ts_column, st["within_watermark"])
                .dropDuplicatesWithinWatermark(["__sig_key"])
                .drop("__sig_key")
            )
        else:
            raise ConfigError(
                f"stage {st['op']!r} needs corpus-global state and cannot run "
                "on a stream (use the batch pipeline, or watermarked "
                "dropDuplicates for streaming dedup)"
            )
    return out
