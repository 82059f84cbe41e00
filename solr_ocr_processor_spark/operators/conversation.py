"""Conversation-structure analytics over the transcripts table.

The reference indexes OCR *pages* whose only structure is order
(app/handler/indexer.go:81-95); this engine's documents are
multi-turn agent transcripts (conv_id, turn_idx, role, text, tool,
ts) and their STRUCTURE is data: which tools fire after which, and
whether a conversation is well-formed enough to train on. Both
operators here are corpus-audit passes a training pipeline runs
before exporting transcripts as SFT/agentic data.

Scale shape shared by both: the only corpus-wide exchange is one
conv_id-keyed window/aggregate (the same shuffle materialize_docs
already performs, so a pre-partitioned input makes them exchange-free);
outputs are |tools|² / |convs| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tool_transitions(turns: DataFrame) -> DataFrame:
    """First-order tool-call transition counts — the Markov skeleton
    of agentic behavior: for each conversation's tool-bearing turns in
    (turn_idx, ts) order, count corpus-wide how often tool ``src`` is
    followed by tool ``dst`` (non-tool turns are transparent: the
    sequence is the SUBSEQUENCE of turns with a tool, so "search →
    think → code" counts search→code). A START pseudo-state marks each
    conversation's first tool call, so P(first tool) falls out of the
    same table.

    Returns (src_tool, dst_tool, n) ordered (n desc, src asc, dst
    asc). One window (lag over conv partitions) + one |tools|²-row
    aggregate; conversations with no tool calls contribute nothing."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    seq = (
        turns.where(F.col("tool").isNotNull())
        .select(
            "conv_id",
            F.coalesce(F.lag("tool").over(w), F.lit("START")).alias("src_tool"),
            F.col("tool").alias("dst_tool"),
        )
    )
    return (
        seq.groupBy("src_tool", "dst_tool")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("src_tool"), F.asc("dst_tool"))
    )


def conv_lint(turns: DataFrame) -> DataFrame:
    """Conversation well-formedness audit — the per-conv lint a
    pipeline runs before exporting transcripts as training data:

    - ``starts_with_user``      first turn's role == 'user'
    - ``ends_with_assistant``   last turn's role == 'assistant'
    - ``n_same_role_adjacent``  adjacent turn pairs with equal role
      (broken user/assistant alternation)
    - ``n_empty_turns``         turns whose text is empty/whitespace
    - ``clean``                 all of the above pass (no violations)

    Turn order is the engine's stable (turn_idx, ts) rule — the same
    ordering the doc materializer indexes by, so lint verdicts speak
    for exactly the text that gets indexed. Returns (conv_id, n_turns,
    starts_with_user, ends_with_assistant, n_same_role_adjacent,
    n_empty_turns, clean) ordered by conv_id.

    ONE conv-partitioned window pass computes first/last/lag in the
    same exchange; the aggregate is conv-keyed with map-side combine."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t = turns.select(
        "conv_id",
        F.first("role").over(wall).alias("first_role"),
        F.last("role").over(wall).alias("last_role"),
        (F.lag("role").over(w) == F.col("role"))
        .cast("int")
        .alias("same_adj"),
        (F.trim(F.col("text")) == "").cast("int").alias("empty_t"),
    )
    out = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.first("first_role").alias("_fr"),
        F.first("last_role").alias("_lr"),
        F.coalesce(F.sum("same_adj"), F.lit(0)).cast("long").alias(
            "n_same_role_adjacent"
        ),
        F.coalesce(F.sum("empty_t"), F.lit(0)).cast("long").alias(
            "n_empty_turns"
        ),
    )
    return out.select(
        "conv_id",
        "n_turns",
        (F.col("_fr") == "user").alias("starts_with_user"),
        (F.col("_lr") == "assistant").alias("ends_with_assistant"),
        "n_same_role_adjacent",
        "n_empty_turns",
        (
            (F.col("_fr") == "user")
            & (F.col("_lr") == "assistant")
            & (F.col("n_same_role_adjacent") == 0)
            & (F.col("n_empty_turns") == 0)
        ).alias("clean"),
    ).orderBy("conv_id")


REFUSAL_PHRASES = (
    "i cannot",
    "i can't",
    "i'm unable to",
    "as an ai",
    "i apologize, but",
    "i'm sorry, but",
)


def refusal_profile(turns: DataFrame) -> DataFrame:
    """Refusal-phrase audit over assistant turns — the SFT-curation
    pass that keeps canned refusals and AI-self-reference boilerplate
    from dominating a training mix: count, per conversation, how many
    ASSISTANT turns contain any of the standard refusal markers
    (case-insensitive substring — the phrase list is a plug-in
    constant, :data:`REFUSAL_PHRASES`).

    Returns (conv_id, n_assistant_turns, n_refusal_turns,
    refusal_frac) for every conversation WITH at least one assistant
    turn, ordered by conv_id; refusal_frac = round 6 of the turn
    fraction (exact BIGINT counts, one divide).

    Plan: one map-side projection evaluates the phrase ORs (lower +
    contains — whole-stage codegen, the blocklist_profile discipline),
    one conv-keyed aggregate with map-side combine."""
    hit = F.lit(False)
    low = F.lower(F.col("text"))
    for p in REFUSAL_PHRASES:
        hit = hit | low.contains(p)
    # NULL text: contains() is NULL and false|NULL = NULL — coalesce to
    # false so the counts match the oracle's CASE ... ELSE 0 exactly
    a = turns.where(F.col("role") == "assistant").select(
        "conv_id", F.coalesce(hit, F.lit(False)).cast("int").alias("hit")
    )
    return (
        a.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_assistant_turns"),
            F.sum("hit").cast("long").alias("n_refusal_turns"),
        )
        .select(
            "conv_id",
            "n_assistant_turns",
            "n_refusal_turns",
            F.round(
                F.col("n_refusal_turns").cast("double")
                / F.col("n_assistant_turns").cast("double"),
                6,
            ).alias("refusal_frac"),
        )
        .orderBy("conv_id")
    )


def template_turns(turns: DataFrame, min_convs: int = 3) -> DataFrame:
    """Boilerplate-turn detection — the turn-level dedup SFT curation
    needs where document-level dedup is blind: an assistant turn whose
    exact normalized text recurs across ``min_convs`` or more DISTINCT
    conversations is a template (greeting, canned closing, tool
    preamble) and inflates its phrasing's weight in training.

    Normalization is whitespace-collapse + lower (templates differ by
    spacing/case, not wording; heavier canonicalization plugs in at
    the same column). Returns (text_hash, n_convs, n_occurrences,
    sample_text) for qualifying templates ordered (n_convs desc,
    text_hash asc) — sample_text = the MIN raw text of the group
    (deterministic representative).

    Plan: md5 the normalized turn map-side; ONE hash-keyed aggregate
    (count + distinct convs + min sample) with map-side combine; the
    threshold filters before any ordering. The exchange moves
    |distinct turn texts| narrow rows, never full turns."""
    if min_convs < 2:
        raise ValueError(f"min_convs must be >= 2, got {min_convs}")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    a = turns.where(
        (F.col("role") == "assistant") & (F.trim(F.col("text")) != "")
    ).select(
        "conv_id",
        F.md5(norm.cast("binary")).alias("text_hash"),
        F.col("text"),
    )
    return (
        a.groupBy("text_hash")
        .agg(
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("text").alias("sample_text"),
        )
        .where(F.col("n_convs") >= min_convs)
        .orderBy(F.desc("n_convs"), F.asc("text_hash"))
    )


def role_stats(transcripts: DataFrame) -> DataFrame:
    """Per-role conversation analytics — the first table anyone pulls
    from a transcripts corpus: how much of the token mass is user vs
    assistant vs tool. Returns one row per role:
    (role, n_turns, n_convs, n_tokens, avg_tokens_scaled) ordered
    role ASC, with ``avg_tokens_scaled = n_tokens*1e6 div n_turns``
    (exact integer mean; 0 when a role has no turns is impossible —
    the group exists only if it has rows).

    Plan: map-only tokenize projection + ONE |roles|-row aggregate
    (count + countDistinct conv), corpus-scan cost."""
    per = transcripts.select(
        "role",
        "conv_id",
        F.size(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).cast("long").alias("n_toks"),
    )
    return (
        per.groupBy("role")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
            F.sum("n_toks").cast("long").alias("n_tokens"),
        )
        .select(
            "role",
            "n_turns",
            "n_convs",
            "n_tokens",
            F.expr("(n_tokens * 1000000) div n_turns").alias(
                "avg_tokens_scaled"
            ),
        )
        .orderBy("role")
    )


def template_exchanges(transcripts: DataFrame, min_convs: int = 2) -> DataFrame:
    """Cross-conversation TEMPLATE EXCHANGES — the two-turn extension
    of :func:`template_turns`: an adjacent (turn, next-turn) pair whose
    normalized text repeats across >= ``min_convs`` conversations is a
    scripted exchange (canned Q→A, injected demo dialogues) that
    single-turn boilerplate detection misses when either half also
    appears legitimately on its own. SFT hygiene: repeated exchanges
    teach the model a template, not a behavior.

    Returns (ex_hash, n_convs, n_occurrences, sample_first) ordered
    n_convs DESC, ex_hash ASC; normalization (lower + trim + collapse
    whitespace) and the md5 discipline are template_turns', applied to
    ``first || '|' || second``.

    Plan: ONE conv-keyed window (lead over turn_idx — the same
    partitioning materialize_docs already uses) + ONE hash-keyed
    aggregate moving (hash, conv) narrow rows; the heavy text rides
    min() as one representative per group."""
    from pyspark.sql.window import Window

    def norm(c):
        return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.select("conv_id", "turn_idx", "text").withColumn(
        "nxt", F.lead("text").over(w)
    )
    pairs = t.where(
        F.col("nxt").isNotNull()
        & (F.trim(F.col("text")) != "")
        & (F.trim(F.col("nxt")) != "")
    )
    h = pairs.select(
        "conv_id",
        F.md5(
            F.concat(norm(F.col("text")), F.lit("|"), norm(F.col("nxt"))).cast(
                "binary"
            )
        ).alias("ex_hash"),
        F.col("text").alias("first_text"),
    )
    return (
        h.groupBy("ex_hash")
        .agg(
            F.countDistinct("conv_id").cast("long").alias("n_convs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("first_text").alias("sample_first"),
        )
        .where(F.col("n_convs") >= F.lit(int(min_convs)))
        .orderBy(F.desc("n_convs"), F.asc("ex_hash"))
    )


def preference_pairs(transcripts: DataFrame, min_replies: int = 2) -> DataFrame:
    """RLHF preference-pair mining over repeated prompts: wherever the
    SAME user prompt (normalized text) appears in >= ``min_replies``
    conversations with different assistant replies, emit one
    (chosen, rejected) pair — the highest- and lowest-reward replies —
    the DPO/RLHF dataset-construction step a training pipeline runs
    after template detection (:func:`template_exchanges` finds the
    scripted prompts; this op turns their reply variance into
    preference signal).

    Reward proxy is deterministic and engine-neutral: the DISTINCT
    token count of the reply (lexical richness under the engine's
    [a-z0-9]+ analyzer — richer replies win). Ties break by
    (conv_id, turn_idx) ascending through the SAME row_number ordering
    on both engines, so the picked pair is unique and the DuckDB twin
    replays it bit-for-bit. Pairs with zero margin (all replies equal
    reward) are dropped — they carry no preference signal.

    Plan: ONE conv-keyed window (lead over turn_idx — the partitioning
    materialize_docs already establishes) to attach each user turn's
    reply, then ONE prompt-hash-keyed window pass computing best/worst
    rank + group size in a single shuffle; the two rank-1 slices
    self-join on prompt_hash (hash-keyed, same exchange). Rows moved
    after the first aggregate are one per (prompt, reply) — the text
    itself never shuffles twice.

    Returns (prompt_hash, n_replies, chosen_conv, chosen_turn,
    chosen_reward, rejected_conv, rejected_turn, rejected_reward,
    margin) ordered margin DESC, prompt_hash ASC."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = (
        transcripts.select("conv_id", "turn_idx", "role", "text")
        .withColumn("reply", F.lead("text").over(w))
        .withColumn("reply_turn", F.lead("turn_idx").over(w))
    )
    pr = t.where(
        (F.col("role") == "user")
        & F.col("reply").isNotNull()
        & (F.trim(F.col("text")) != "")
        & (F.trim(F.col("reply")) != "")
    )
    base = pr.select(
        F.md5(
            F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))).cast(
                "binary"
            )
        ).alias("prompt_hash"),
        "conv_id",
        F.col("reply_turn").cast("int").alias("turn_idx"),
        F.size(
            F.array_distinct(
                F.regexp_extract_all(
                    F.lower(F.col("reply")), F.lit("[a-z0-9]+"), F.lit(0)
                )
            )
        )
        .cast("long")
        .alias("reward"),
    )
    wp = Window.partitionBy("prompt_hash")
    wb = wp.orderBy(F.desc("reward"), F.asc("conv_id"), F.asc("turn_idx"))
    ww = wp.orderBy(F.asc("reward"), F.asc("conv_id"), F.asc("turn_idx"))
    ranked = (
        base.withColumn("rb", F.row_number().over(wb))
        .withColumn("rw", F.row_number().over(ww))
        .withColumn("n_replies", F.count(F.lit(1)).over(wp).cast("long"))
    )
    # SINGLE-TREE extremes: slicing rank-1 rows into two branches and
    # self-joining would execute the whole transcript derivation
    # twice (measured 68 s -> ~3 s at sf0.1); instead keep both
    # rank-1 rows in one relation and fold them with max(when(...))
    # structs — exactly one candidate per side per group, so the max
    # is a passthrough, and the plan stays one derivation + one
    # hash aggregate.
    flat = ranked.where((F.col("rb") == 1) | (F.col("rw") == 1))
    agg = flat.groupBy("prompt_hash").agg(
        F.max("n_replies").alias("n_replies"),
        F.max(
            F.when(
                F.col("rb") == 1,
                F.struct("conv_id", "turn_idx", "reward"),
            )
        ).alias("ch"),
        F.max(
            F.when(
                F.col("rw") == 1,
                F.struct("conv_id", "turn_idx", "reward"),
            )
        ).alias("rj"),
    )
    return (
        agg.where(
            (F.col("n_replies") >= F.lit(int(min_replies)))
            & (F.col("ch.reward") > F.col("rj.reward"))
        )
        .select(
            "prompt_hash",
            "n_replies",
            F.col("ch.conv_id").alias("chosen_conv"),
            F.col("ch.turn_idx").alias("chosen_turn"),
            F.col("ch.reward").alias("chosen_reward"),
            F.col("rj.conv_id").alias("rejected_conv"),
            F.col("rj.turn_idx").alias("rejected_turn"),
            F.col("rj.reward").alias("rejected_reward"),
            (F.col("ch.reward") - F.col("rj.reward"))
            .cast("long")
            .alias("margin"),
        )
        .orderBy(F.desc("margin"), F.asc("prompt_hash"))
    )


def topic_segments(transcripts: DataFrame, tau: float = 0.2) -> DataFrame:
    """Lexical topic segmentation of conversations (TextTiling's
    adjacent-similarity rule at turn granularity): a segment boundary
    falls between consecutive turns whose DISTINCT-token Jaccard
    similarity drops below ``tau`` — the preprocessing step that
    splits long multi-topic agent traces into coherent training
    chunks before packing, and the lexical stand-in for
    embedding-based segmentation (same plan, swap the similarity
    column).

    Returns one row per conversation: (conv_id, n_turns, n_segments,
    mean_jacc) with mean_jacc the average adjacent-pair similarity
    (rounded 6dp; single-turn convs have n_segments = 1 and NULL
    mean_jacc), ordered conv_id.

    Plan: ONE conv-keyed window (lag — the materialize partitioning)
    computing intersection size against the previous turn's distinct
    tokens, then one conv-keyed aggregate. The token arrays live only
    inside the window stage; the aggregate moves three numbers per
    turn."""
    from pyspark.sql.window import Window

    toks = F.array_distinct(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0)
        )
    )
    t = transcripts.where(F.length(F.trim(F.col("text"))) > 0).select(
        "conv_id", "turn_idx", toks.alias("toks")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    p = t.withColumn("prev", F.lag("toks").over(w))
    inter = F.size(F.array_intersect(F.col("toks"), F.col("prev")))
    union = F.size("toks") + F.size("prev") - inter
    jacc = F.when(
        F.col("prev").isNotNull(),
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)),
    )
    scored = p.select(
        "conv_id",
        jacc.alias("jacc"),
        F.when(jacc < F.lit(float(tau)), F.lit(1))
        .otherwise(F.lit(0))
        .alias("boundary"),
    )
    return (
        scored.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            (F.lit(1) + F.sum("boundary")).cast("long").alias("n_segments"),
            F.round(F.avg("jacc"), 6).alias("mean_jacc"),
        )
        .orderBy("conv_id")
    )


def loss_mask_stats(transcripts: DataFrame) -> DataFrame:
    """SFT loss-mask accounting: in supervised fine-tuning only the
    ASSISTANT turns carry loss — user/tool tokens are context, masked
    out. Per conversation, count total vs trainable tokens so the
    batch packer and the cost model see the EFFECTIVE token budget
    (a corpus can be 10x bigger than its trainable mass; epochs and
    lr schedules should be sized on the latter).

    Returns (conv_id, n_turns, n_tokens, n_trainable, trainable_frac)
    with the fraction rounded 6dp (0.0 when the conv has no tokens),
    ordered conv_id. Empty/whitespace turns are dropped first — the
    same dense-ordinal rule the indexer applies.

    ONE conv-keyed aggregate over per-turn token counts (the
    analyzer's [a-z0-9]+ rule); map-side combinable."""
    n = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0)
        )
    ).cast("long")
    t = transcripts.where(F.length(F.trim(F.col("text"))) > 0).select(
        "conv_id",
        n.alias("nt"),
        F.when(F.col("role") == "assistant", n).otherwise(F.lit(0)).alias(
            "tr"
        ),
    )
    return (
        t.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum("nt").cast("long").alias("n_tokens"),
            F.sum("tr").cast("long").alias("n_trainable"),
        )
        .select(
            "conv_id",
            "n_turns",
            "n_tokens",
            "n_trainable",
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("n_trainable") / F.col("n_tokens").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("trainable_frac"),
        )
        .orderBy("conv_id")
    )
