"""Distributed BPE (byte-pair-encoding) merge training on Spark.

The classic subword-vocabulary trainer (Sennrich et al. 2016): start
from character symbols, repeatedly find the corpus-wide most frequent
adjacent symbol pair (weighted by word frequency) and merge it — the
algorithm behind GPT/SentencePiece vocabularies. The reference repo has
no tokenizer training; this is the training-data-pipeline side of the
engine (SURVEY.md §2.6 scope: corpus-statistics operators).

Spark-first design: the corpus collapses to the WORD VOCABULARY first
(one groupBy — BPE statistics only depend on (word, count), so 100 TB
of text becomes |V| rows ≤ a few million), and every round is

  vocab → explode adjacent pairs (map-local array transform)
        → groupBy (left, right) with map-side combine
        → global top-1 = TakeOrderedAndProject
        → broadcast the 1-row winner, re-merge symbols map-side with a
          JVM `aggregate()` fold (greedy left-to-right, exactly BPE's
          scan order) — no Python touches a row.

Rounds are a fixed driver-side loop over DataFrame transformations
(lazy — one DAG); Spark reuses each round's shuffle files across the
per-round jobs, so round r's vocab aggregation is not recomputed from
raw text. The same greedy fold is expressed in the DuckDB oracle with
`list_reduce`, making the whole iterative trainer value-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _spaced_chars(w: Column) -> Column:
    """'hello' -> 'h e l l o' (symbols joined by single spaces).

    SQL mirror: trim(regexp_replace(w, '(.)', '\\1 ', 'g'), ' ').
    """
    return F.trim(F.regexp_replace(w, "(.)", "$1 "))


def _merge_fold(l: Column, lft: Column, rgt: Column) -> Column:
    """Column-form greedy merge fold (see ``_merge_fold_sql``): kept
    for per-row (non-literal) pairs and as the semantic pin the
    equivalence tests compare the SQL form against."""
    init = F.element_at(l, 1)
    rest = F.slice(l, 2, F.greatest(F.size(l) - 1, F.lit(0)))

    def fold(acc: Column, x: Column) -> Column:
        tail = F.substr(acc, F.length(acc) - F.length(lft) + 1, F.length(lft))
        boundary = (F.length(acc) == F.length(lft)) | (
            F.substr(acc, F.length(acc) - F.length(lft), F.lit(1)) == F.lit(" ")
        )
        return F.when(
            (x == rgt) & (tail == lft) & boundary,
            F.concat(
                F.substr(acc, F.lit(1), F.length(acc) - F.length(lft)), lft, rgt
            ),
        ).otherwise(F.concat(acc, F.lit(" "), x))

    return F.aggregate(rest, init, fold)


def _merge_fold_sql(lft: str, rgt: str) -> str:
    """Greedy left-to-right merge of adjacent (lft, rgt) symbol pairs,
    folding the spaced-string column ``s`` back together, as ONE parsed
    SQL expression (the Column-operator form cost ~500 py4j round-trips
    per merge round — functions/litfast rationale; identical tree).

    The accumulator's LAST symbol is merged with the incoming one iff
    they equal the winning pair — byte-equal to DuckDB's `list_reduce`
    with the same CASE (the boundary test keeps token identity exact
    even when one symbol is a suffix of another).
    """
    from datagouv_tools_spark.functions.litfast import sql_string

    L, R = sql_string(lft), sql_string(rgt)
    arr = "split(s, ' ')"
    tail = f"substr(acc, length(acc) - length({L}) + 1, length({L}))"
    boundary = (
        f"(length(acc) = length({L})"
        f" OR substr(acc, length(acc) - length({L}), 1) = ' ')"
    )
    fold = (
        f"CASE WHEN (x = {R}) AND ({tail} = {L}) AND {boundary}"
        f" THEN concat(substr(acc, 1, length(acc) - length({L})), {L}, {R})"
        f" ELSE concat(acc, ' ', x) END"
    )
    return (
        f"aggregate(slice({arr}, 2, greatest(size({arr}) - 1, 0)),"
        f" element_at({arr}, 1), (acc, x) -> {fold})"
    )


def bpe_train(
    words: DataFrame, rounds: int, *, return_corpus: bool = False
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Train ``rounds`` BPE merges over a word-frequency DataFrame.

    ``words`` must have columns ``w`` (string) and ``wc`` (bigint
    count). Returns one row per merge round: (merge_round, lft, rgt,
    merged, cnt), ties broken by (count desc, lft, rgt) so the winner
    is unique and cross-engine deterministic. With
    ``return_corpus=True`` returns ``(winners, corpus)`` where
    ``corpus`` is the fully-merged (w, wc, s) segmentation — identical
    to ``bpe_apply(words, winners)`` (pinned by test) but free: the
    trainer already built it, so tokenize-the-training-corpus callers
    skip a redundant chain of |merges| fold passes.

    Job economy: round r's winner ``collect`` is the only action — it
    fills round r's cache, after which round r-1's cache is dropped.
    The re-merged corpus for the LAST round is built only when
    ``return_corpus`` asks for it (the winners don't need it).
    """
    spark = words.sparkSession
    corpus = words.select(
        "w", "wc", _spaced_chars(F.col("w")).alias("s")
    ).persist()
    prev: DataFrame | None = None
    winners: list[tuple[int, str, str, str, int]] = []
    # one parsed expr per round for the pair expansion (litfast
    # rationale; ~150 Column-op round-trips otherwise, per round)
    _pair_sql = (
        "explode(transform(sequence(1, size(split(s, ' ')) - 1),"
        " i -> named_struct("
        "'lft', element_at(split(s, ' '), i),"
        "'rgt', element_at(split(s, ' '), i + 1))))"
    )
    for r in range(rounds):
        # Spark's sequence(1, 0) DESCENDS ([1, 0]) where DuckDB's
        # generate_series(1, 0) is empty — single-symbol words must be
        # filtered out before pair expansion, not guarded arithmetically.
        pairs = corpus.filter(F.expr("size(split(s, ' ')) >= 2")).select(
            "wc",
            F.expr(_pair_sql).alias("p"),
        ).select("wc", "p.lft", "p.rgt")
        counted = pairs.groupBy("lft", "rgt").agg(F.sum("wc").alias("cnt"))
        # The winner is ONE row (TakeOrdered) — collecting it is the
        # bounded-driver pattern, and folding it back as literals keeps
        # each round's plan flat instead of stacking R crossJoin
        # subtrees that re-execute the whole lineage per round. This
        # collect also materializes THIS round's cache (counted reads
        # corpus), so the previous round's cache can be released now.
        row = counted.orderBy(F.desc("cnt"), "lft", "rgt").limit(1).collect()
        if prev is not None:
            prev.unpersist()
            prev = None
        if not row:
            break
        lft, rgt, cnt = row[0].lft, row[0].rgt, row[0].cnt
        winners.append((r + 1, lft, rgt, lft + rgt, int(cnt)))
        if r + 1 == rounds and not return_corpus:
            break  # nothing ever reads the final re-merged corpus
        nxt = corpus.select(
            "w",
            "wc",
            F.expr(_merge_fold_sql(lft, rgt)).alias("s"),
        ).persist()
        prev, corpus = corpus, nxt
    winners_df = spark.createDataFrame(
        winners, "merge_round bigint, lft string, rgt string, merged string, cnt bigint"
    ).orderBy("merge_round")
    if return_corpus:
        # materialize the final fold off the still-cached previous
        # round, then detach it from the per-round lineage so the
        # caches below can be released safely
        final = corpus.localCheckpoint(eager=True)
        corpus.unpersist()
        if prev is not None:
            prev.unpersist()
        return winners_df, final
    corpus.unpersist()
    if prev is not None:
        prev.unpersist()
    return winners_df


def bpe_oracle_sql(rounds: int, tokens_sql: str, tail: str | None = None) -> str:
    """The DuckDB twin of :func:`bpe_train` as one CTE chain.

    ``tokens_sql`` is a SQL expression producing the token list per
    document row (the shared ``_SQL_TOKENS`` macro). Each round r adds
    three CTEs: pair counts ``p{r}``, the unique winner ``b{r}``, and
    the re-merged corpus ``c{r+1}`` (a `list_reduce` fold identical to
    the Spark-side `aggregate`). The default ``tail`` selects the
    per-round winners; pass a custom tail to query the FINAL merged
    corpus ``c{rounds}`` instead (the train→apply round trip).
    """
    parts = [
        f"""
    WITH vocab AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS wc
      FROM (SELECT unnest({tokens_sql}) AS w FROM documents)
      GROUP BY w
    ),
    c0 AS (SELECT w, wc, trim(regexp_replace(w, '(.)', '\\1 ', 'g'), ' ') AS s
           FROM vocab)"""
    ]
    for r in range(rounds):
        parts.append(
            f""",
    p{r} AS (
      SELECT split_part(p, ' ', 1) AS lft, split_part(p, ' ', 2) AS rgt,
             CAST(SUM(wc) AS BIGINT) AS cnt
      FROM (
        SELECT wc, unnest(list_transform(generate_series(1, len(l) - 1),
                    i -> l[i] || ' ' || l[i+1])) AS p
        FROM (SELECT wc, string_split(s, ' ') AS l FROM c{r})
      ) GROUP BY lft, rgt
    ),
    b{r} AS (SELECT lft, rgt, cnt FROM p{r}
             ORDER BY cnt DESC, lft, rgt LIMIT 1),
    c{r + 1} AS (
      SELECT w, wc,
        list_reduce(string_split(s, ' '), (acc, x) -> CASE
          WHEN x = b.rgt
               AND substr(acc, len(acc) - len(b.lft) + 1) = b.lft
               AND (len(acc) = len(b.lft)
                    OR substr(acc, len(acc) - len(b.lft), 1) = ' ')
          THEN substr(acc, 1, len(acc) - len(b.lft)) || b.lft || b.rgt
          ELSE acc || ' ' || x END) AS s
      FROM c{r} CROSS JOIN b{r} b
    )"""
        )
    if tail is None:
        selects = "\n    UNION ALL ".join(
            f"SELECT CAST({r + 1} AS BIGINT) AS merge_round, lft, rgt,"
            f" lft || rgt AS merged, cnt FROM b{r}"
            for r in range(rounds)
        )
        tail = f"\n    {selects}\n    ORDER BY merge_round"
    parts.append(tail)
    return "".join(parts)


def bpe_apply(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply an ordered merge list to a word DataFrame (columns ``w``,
    ``wc``): the tokenize-with-a-trained-vocabulary half of BPE. Each
    merge is one map-local greedy fold, chained in training order —
    identical to how the trainer itself re-merges, so apply(train())
    reproduces the trainer's final corpus exactly. Returns
    (w, wc, s) with ``s`` the space-joined subword segmentation."""
    corpus = words.select("w", "wc", _spaced_chars(F.col("w")).alias("s"))
    for lft, rgt in merges:
        corpus = corpus.select(
            "w",
            "wc",
            F.expr(_merge_fold_sql(lft, rgt)).alias("s"),
        )
    return corpus
