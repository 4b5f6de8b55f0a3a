"""BPE vocabulary induction — learning a tokenizer from the corpus.

The engine already counts and budgets tokens (``functions/text.py``);
this operator LEARNS the subword vocabulary itself: byte-pair encoding
(Sennrich et al. 2016, the construction under GPT-2/RoBERTa-class
tokenizers), expressed Spark-first.

The key scale observation: BPE never needs the raw corpus after one
pass. It operates on the (word, count) table — vocabulary-sized, orders
of magnitude smaller than 100 TB of text — and each merge iteration is
one pair-count aggregation over that table plus a driver-side argmax of
a single row. So the shape here is:

* ``word_counts`` — one explode + combine-shuffle over the corpus (the
  only corpus-sized step);
* ``learn_bpe`` — an iterative driver loop over the checkpointed
  word-count table: explode adjacent symbol pairs (weighted by word
  count), one combine-shuffle per round, ``orderBy().limit(1)`` argmax
  (TakeOrderedAndProject — no global sort), then a greedy left-to-right
  in-row merge fold. O(n_merges) rounds by construction, like the
  reference implementations;
* ``segment_vocab`` — apply the learned merges to the VOCAB once (not
  per document occurrence); encoding a corpus is then a broadcast join
  word → tokens, the standard production layout.

The merge fold runs in the interpreted HOF path, but over the
vocab-sized table that's the right trade (cf. the measured MinHash note
in ``dedup.minhash_vectors`` — here there is no corpus-sized HOF work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .lm import unigram_counts

#: End-of-word sentinel symbol (kept out of [a-z0-9] so it can never
#: collide with corpus characters after the engine tokenizer).
EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) over the engine tokenizer — the only corpus-sized pass.
    Delegates to the LM's :func:`~.lm.unigram_counts` so the BPE vocab and
    the unigram LM can never diverge on tokenize-and-count semantics."""
    return unigram_counts(docs, text_col).select(
        F.col("token").alias("word"), F.col("c").alias("wc")
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """Characters of the word plus the end-of-word sentinel."""
    return F.concat(F.split(word, ""), F.array(F.lit(EOW)))


def _merge_pair(syms: F.Column, a: str, b: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (a, b) into ``a+b`` — the
    standard BPE application order, as an in-row fold."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_count: int = 2,
    word_counts_df: DataFrame | None = None,
    merges_per_round: int = 1,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges; returns ``[(a, b, count)]``
    in merge order.

    Deterministic: the winning pair each round is max total count, ties
    broken lexicographically on (a, b) — so the learned vocabulary is a
    pure function of the corpus. Stops early when no pair reaches
    ``min_pair_count`` (merging hapax pairs memorizes noise).

    ``merges_per_round`` is the job-count lever for realistic vocab
    sizes: a 32k-merge vocabulary at one Spark job per merge is 32k
    sequential jobs. With ``merges_per_round = k``, each round's pair
    census admits up to k merges whose SYMBOL SETS are pairwise disjoint
    (greedy by the same (count desc, a, b) order): disjoint pairs cannot
    create or destroy each other's adjacencies, so their counts are
    simultaneously valid and one fold applies them all — cutting driver
    rounds ~k× (measured at sf0.01, k=16: learning to full pair
    exhaustion — 111 merges, every vocab word fused — took 6.3 s vs
    15.2 s for just the FIRST 50 merges sequentially; at a 32k-merge
    production vocab the round count drops from 32k jobs to ~2k).
    k=1 is EXACTLY classic sequential BPE (the x45 oracle path); k>1 is
    the standard batched approximation — it may pick the k-th pair
    before a pair that a freshly-merged symbol would have created, so
    the merge SEQUENCE can differ from sequential BPE (the batched
    python reference in tests pins the exact batched semantics).

    Pass ``word_counts_df`` (a :func:`word_counts` result) when the
    caller also needs the vocabulary — the corpus-sized counting pass
    then runs exactly once between them (x45 does this).
    """
    if merges_per_round < 1:
        raise ValueError("merges_per_round must be >= 1")
    wc = word_counts_df if word_counts_df is not None else word_counts(docs, text_col)
    words = (
        wc.select(_initial_symbols(F.col("word")).alias("syms"), "wc")
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        room = min(merges_per_round, n_merges - len(merges))
        pairs = F.zip_with(
            F.slice("syms", 1, F.size("syms") - 1),
            F.slice("syms", 2, F.size("syms") - 1),
            lambda x, y: F.struct(x.alias("a"), y.alias("b")),
        )
        # 4x candidate headroom: conflicts knock some of the top rows out
        # of the batch; the collect stays bounded by 4k tiny rows.
        top = (
            words.filter(F.size("syms") >= 2)
            .select(F.explode(pairs).alias("p"), "wc")
            .groupBy("p.a", "p.b")
            .agg(F.sum("wc").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(room * 4)
            .collect()
        )
        picked: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in top:
            if r["n"] < min_pair_count:
                break
            a, b = r["a"], r["b"]
            if a in used or b in used:
                continue
            picked.append((a, b, int(r["n"])))
            used.update((a, b))
            if len(picked) == room:
                break
        if not picked:
            break
        merges.extend(picked)
        syms = F.col("syms")
        for a, b, _ in picked:
            syms = _merge_pair(syms, a, b)
        words = words.select(syms.alias("syms"), "wc").localCheckpoint()
    return merges


def learn_bpe_local(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_count: int = 2,
    word_counts_df: DataFrame | None = None,
    merges_per_round: int = 1,
    max_words: int = 1_000_000,
) -> list[tuple[str, str, int]]:
    """Production-vocab BPE learning: ONE corpus pass, then the whole
    merge loop runs driver-side over the collected (word, count) table
    with delta-updated pair counts — how reference trainers
    (subword-nmt, HuggingFace) actually learn 32k merges.

    Equivalence contract: returns EXACTLY :func:`learn_bpe`'s merge list
    for the same inputs at any ``merges_per_round`` (same census
    semantics — per-occurrence pair counts, (count desc, a, b)
    tie-break, the 4×room candidate window, disjoint-symbol batching,
    ``min_pair_count`` early stop) — pinned by test. The distributed
    path stays as the oracle twin; this one exists because at a
    production 32k-merge vocabulary the distributed loop is ~2k
    sequential Spark jobs (each a full pair-recount shuffle of the word
    table), while here each merge touches only the words CONTAINING the
    merged pair: learning scales with merge count ~linearly, not with
    driver-round latency.

    Bounded-sample contract (mirrors ``similarity.train_pq_codebooks``):
    the collect takes the top ``max_words`` words by (count desc, word)
    — a 100 TB corpus has an unbounded hapax tail, but BPE pair mass
    concentrates in frequent words, and capping the trainer vocabulary
    is what production tokenizers do. The cap is a DOCUMENTED
    truncation, not an error: below it (every test fixture) results are
    identical to the uncapped distributed path.
    """
    if merges_per_round < 1:
        raise ValueError("merges_per_round must be >= 1")
    import heapq
    from collections import defaultdict

    wc = word_counts_df if word_counts_df is not None else word_counts(docs, text_col)
    rows = (
        wc.orderBy(F.desc("wc"), F.asc("word")).limit(max_words).collect()
    )
    words: list[list[str]] = [list(r["word"]) + [EOW] for r in rows]
    counts: list[int] = [int(r["wc"]) for r in rows]
    pair_n: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        c = counts[i]
        for p in zip(syms, syms[1:]):
            pair_n[p] += c
            pair_words[p].add(i)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        room = min(merges_per_round, n_merges - len(merges))
        # same candidate window as the distributed path: top 4×room rows
        # of the PRE-ROUND census, ordered (count desc, a, b)
        cands = heapq.nsmallest(
            room * 4,
            ((-n, a, b) for (a, b), n in pair_n.items() if n > 0),
        )
        picked: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for negn, a, b in cands:
            if -negn < min_pair_count:
                break
            if a in used or b in used:
                continue
            picked.append((a, b, -negn))
            used.update((a, b))
            if len(picked) == room:
                break
        if not picked:
            break
        merges.extend(picked)
        for a, b, _ in picked:
            merged = a + b
            # pair_words may hold stale indices (word rewritten since it
            # was registered); for those the fold is a no-op and the
            # subtract/re-add cancels — correctness never depends on
            # eager set maintenance, only the touched-word bound does.
            for i in pair_words.pop((a, b), set()):
                syms, c = words[i], counts[i]
                for p in zip(syms, syms[1:]):
                    pair_n[p] -= c
                new: list[str] = []
                for s in syms:
                    if new and new[-1] == a and s == b:
                        new[-1] = merged
                    else:
                        new.append(s)
                words[i] = new
                for p in zip(new, new[1:]):
                    pair_n[p] += c
                    pair_words[p].add(i)
    return merges


def segment_vocab(
    words: DataFrame, merges: list[tuple[str, str, int]], word_col: str = "word"
) -> DataFrame:
    """(word, pieces) — the learned segmentation of each vocabulary word,
    applying the merges in learned order. Encode a corpus by broadcast-
    joining this table onto exploded tokens: the merges run once per
    VOCAB word, never per corpus occurrence."""
    syms = _initial_symbols(F.col(word_col))
    for a, b, _ in merges:
        syms = _merge_pair(syms, a, b)
    return words.select(word_col, syms.alias("pieces"))


def piece_vocab(seg: DataFrame) -> list[str]:
    """Sorted distinct pieces of a :func:`segment_vocab` result — the
    token-id vocabulary. Bounded by |alphabet| + n_merges (each merge
    creates exactly one new symbol), so the collect is a documented
    driver-sized set (~33k rows at a production 32k-merge vocab), the
    same class as the PQ codebooks and PRF seeds. Ids are assigned by
    sorted order: a pure function of the corpus, like the merges."""
    return [
        r["p"]
        for r in seg.select(F.explode("pieces").alias("p"))
        .distinct()
        .orderBy("p")
        .collect()
    ]


def encode_corpus(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    word_counts_df: DataFrame | None = None,
) -> DataFrame:
    """Tokenize the corpus with a learned BPE vocabulary:
    (id, token_ids array<int>, n_tokens, n_unk) — the encode half of the
    tokenizer, turning text into the integer sequences a training
    pipeline actually consumes (feed the result to
    ``operators.packing.pack_sequences`` for fixed-length batches).

    Shape (the production layout the ``segment_vocab`` docstring names):
    merges are applied once per VOCAB word, never per corpus occurrence —

    * segment the (corpus or supplied) word vocabulary, resolve each
      word's pieces to ids via the sorted piece vocabulary (broadcast
      map over a VOCAB-sized frame; the id map itself is
      alphabet+n_merges tiny);
    * one corpus pass: ``posexplode(tokens(text))`` and an equi-join on
      the word (vocab-keyed shuffle; a corpus word vocabulary at 100 TB
      is ~10^8 rows — too big to broadcast, exactly right to shuffle);
    * reassemble per document: one groupBy(id) collecting (pos, ids)
      pairs, ``array_sort`` on pos, flatten. Two corpus-sized shuffles
      total, both on natural keys.

    Words absent from the segmentation vocabulary (new docs under a
    frozen vocab) contribute their pieces as UNK id -1 and are counted
    in ``n_unk`` — the fallback every production tokenizer needs, never
    an error. Documents with zero tokens produce no output row (nothing
    to pack); ``word_counts_df`` must be a :func:`word_counts` result
    (distinct words — duplicates would duplicate piece positions)."""
    wc = word_counts_df if word_counts_df is not None else word_counts(docs, text_col)
    seg = segment_vocab(wc.select("word"), merges)
    spark = docs.sparkSession
    pieces_df = spark.createDataFrame(
        list(enumerate(piece_vocab(seg))), "pid int, piece string"
    )
    # resolve piece -> id over the VOCAB-sized frame: explode pieces with
    # position, broadcast-join the tiny id table, reassemble in order (a
    # create_map literal would put the whole 32k-piece vocab INTO the
    # Catalyst plan; a broadcast join keeps the plan O(1))
    word_ids = (
        seg.select("word", F.posexplode("pieces").alias("ppos", "piece"))
        .join(F.broadcast(pieces_df), "piece", "left")
        .groupBy("word")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ppos", F.coalesce("pid", F.lit(-1)).alias("pid"))
                    )
                ),
                lambda s: s["pid"],
            ).alias("ids")
        )
    )
    exploded = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "word")
    )
    per_word = exploded.join(word_ids, "word", "left").select(
        id_col,
        "pos",
        # unseen word under a frozen vocab: its whole surface is one UNK
        F.coalesce("ids", F.array(F.lit(-1))).alias("ids"),
    )
    return (
        per_word.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "ids"))
            ).alias("chunks")
        )
        .select(
            id_col,
            F.flatten(F.col("chunks.ids")).alias("token_ids"),
        )
        .select(
            id_col,
            "token_ids",
            F.size("token_ids").alias("n_tokens"),
            F.size(F.filter("token_ids", lambda t: t == -1)).alias("n_unk"),
        )
    )
