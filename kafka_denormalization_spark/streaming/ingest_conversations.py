"""Continuous-ingest CONVERSATION curation — the streaming face of the
round-9 conversation/preference batch family (VERDICT r09 next-round
#5): nested conversations arrive as micro-batches and flow through

    turn unnest (conversation_turns — narrow generator)
      -> turn-level NEAR-dedup vs every turn that ever survived
         (reworded canned responses; durable MinHash-LSH band-bucket +
         gram-digest state via the shared IngestNearDedup machinery,
         keyed by a stable per-turn long)
      -> instruction/response pair assembly (equi-join on
         (conv_id, turn_idx+1) — both sides of a pair must have
         SURVIVED turn dedup)
      -> response-side decontamination against a FROZEN eval-answer
         gram table (the lm_model freeze/apply pattern: eval sets are
         corpus-external and never grow with the stream, so the gate
         reads parquet frozen once by
         functions/conversations.py freeze_eval_grams and broadcasts
         it per batch — a memorized benchmark ANSWER in an assistant
         turn is the leak the instruction-side scan misses)
      -> curated SFT pairs.

Corpus-GLOBAL stages of the batch family (conversation-LEVEL near-dedup
over reassembled transcripts, preference-pair ASSEMBLY) are
deliberately NOT incrementalized here for the same reason
ingest_curation.py skips the LM gate and the temperature mix: a
transcript's near-dup identity and a prompt's best/worst response pair
are functions of the WHOLE corpus — a faithful streaming version would
revise past emissions every batch. Production pipelines run those as
periodic batch rebuilds over the curated-pair store this twin emits;
the batch operators (queries.py q_conv_near_dedup,
functions/preference.py preference_pairs) remain canonical. Pair-level
near-DEDUP of an already-assembled pair stream, by contrast, is
first-occurrence-wins and incrementalizes cleanly —
:class:`IngestPrefPairDedup` below.

Durable state: exactly IngestNearDedup's two hash-bucket-partitioned
parquet tables under ``state_dir`` (band_buckets/ + gram_digests/ of
surviving TURN content) — restart resumes the turn-dedup memory; the
frozen gram table is immutable input, not state.

Exactly-once: state appends are set-semantics idempotent (the
IngestNearDedup story); wrap the sink with
streaming/sinks.py idempotent_foreach_batch for emit dedup.

Reference parity: the reference has no conversation surface at all
(its values are Hacker News stories/comments —
schema/story/Story.java); this is the north-star extension's SFT lane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_denormalization_spark.functions.conversations import (
    conversation_turns,
    instruction_response_pairs,
    pair_decontaminate_frozen,
)
from kafka_denormalization_spark.streaming.ingest_dedup import IngestNearDedup

# stable per-turn long key: conv_id * 4096 + turn_idx (the conversation
# fixture's own packing — queries.py pair_id // 4096). Monotone conv_ids
# across batches => monotone turn keys, so the streamed min-key
# retention equals the batch operator's smaller-key-survives rule.
TURN_KEY_STRIDE = 4096


def role_scope_split(
    turns: DataFrame, roles: tuple[str, ...]
) -> tuple[DataFrame, DataFrame]:
    """EXHAUSTIVE (in_scope, pass_through) split of a turn frame by
    role membership (ADVICE r11 #2): for a NULL role both
    ``isin(...)`` and ``~isin(...)`` evaluate to NULL, so a naive
    filter pair lands such turns in NEITHER side and silently drops
    them — ``dedup_roles=None`` passes them through, and the scoped
    regime must too (a NULL role is never a member of the scope
    tuple). Every input row lands in exactly one side."""
    member = F.col("role").isin(*roles)
    return (
        turns.filter(member),
        turns.filter(F.coalesce(~member, F.lit(True))),
    )


class IngestConvCuration:
    """Composed continuous conversation curation with durable
    turn-dedup state and a frozen decontamination gate.

    ``process_batch(batch_df)`` takes nested conversations
    (conv_col, turns array<struct<role string, content string>>) and
    returns the batch's curated SFT pairs:
    (conv_id, turn_idx, instruction, response).

    ``frozen_grams_path``: parquet written by
    ``functions/conversations.py freeze_eval_grams`` — (_eid, _g) rows
    of eval-answer n-grams. None disables the decontamination gate
    (turn dedup only).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        conv_col: str = "conv_id",
        turns_col: str = "turns",
        near_threshold: float = 0.5,
        n: int = 3,
        num_hashes: int = 64,
        bands: int = 32,
        frozen_grams_path: str | None = None,
        decon_n: int = 8,
        n_buckets: int = 32,
        dedup_roles: tuple[str, ...] | None = None,
    ) -> None:
        self.spark = spark
        self.conv_col = conv_col
        self.turns_col = turns_col
        self.decon_n = decon_n
        # None = every turn enters the near-dedup (the r10 behavior).
        # A role tuple (e.g. ("assistant",)) scopes the dedup state to
        # those roles and passes other turns through UNTOUCHED — the
        # preference-composition regime, where identical user
        # instructions are the pair-assembly GROUPING KEY and must not
        # be collapsed by turn identity (IngestPrefCuration below).
        self.dedup_roles = dedup_roles
        self._frozen_path = frozen_grams_path
        self._frozen: DataFrame | None = None
        self._near = IngestNearDedup(
            spark,
            state_dir,
            "_turn_key",
            "content",
            n=n,
            num_hashes=num_hashes,
            bands=bands,
            threshold=near_threshold,
            n_buckets=n_buckets,
        )

    def _frozen_grams(self) -> DataFrame:
        if self._frozen is None:
            # immutable input — read once per twin instance, broadcast
            # per batch inside pair_decontaminate_frozen
            self._frozen = self.spark.read.parquet(self._frozen_path)
        return self._frozen

    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> DataFrame:
        turns = conversation_turns(batch_df, self.conv_col, self.turns_col)
        keyed = turns.select(
            (F.col("conv_id") * TURN_KEY_STRIDE + F.col("turn_idx")).alias(
                "_turn_key"
            ),
            "conv_id",
            "turn_idx",
            "role",
            "content",
        )
        if self.dedup_roles is None:
            surv_turns = self._near.process_batch(keyed, epoch_id).drop(
                "_turn_key"
            )
        else:
            in_scope, pass_through = role_scope_split(
                keyed, self.dedup_roles
            )
            surv_turns = (
                self._near.process_batch(in_scope, epoch_id)
                .unionByName(pass_through)
                .drop("_turn_key")
            )
        prs = instruction_response_pairs(surv_turns)
        if self._frozen_path is None:
            return prs
        return (
            pair_decontaminate_frozen(
                prs, self._frozen_grams(), side="response", n=self.decon_n
            )
            .filter(~F.col("contaminated"))
            .select("conv_id", "turn_idx", "instruction", "response")
        )

    def foreach_batch(self, sink):
        """Adapter for ``writeStream.foreachBatch``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            sink(self.process_batch(batch_df, epoch_id), epoch_id)

        return fn

    def compact(self) -> dict[str, int]:
        """Compact the turn-dedup state tables (see ingest_dedup)."""
        return self._near.compact()


class IngestPrefPairDedup:
    """Continuous preference-pair near-dedup — the streaming face of
    functions/preference.py ``preference_pair_dedup``'s BOTH-SIDES rule:
    a batch pair is dropped iff its CHOSEN side near-dups a surviving
    earlier pair's chosen side AND its REJECTED side near-dups the SAME
    pair's rejected side (one matching side is a new comparison — the
    reward signal differs — so single-side matches ship).

    Composition, not new machinery: two IngestNearDedup states (one per
    side, disjoint subdirectories of ``state_dir``) expose their
    verified near-dup PAIR tables via ``match_pairs``; the both-sides
    rule is the equi-join of the two tables on (id_a, id_b), applied to
    cross-batch (vs surviving state) and within-batch (smaller pair_id
    survives) matches alike. Survivors commit to BOTH side states.

    Input batches: (pair_id long, chosen string, rejected string) —
    the assembled-pair stream (assembly itself is corpus-global, see
    the module docstring). Output: the batch's surviving pairs.

    Equivalence regime (the twin standard): pair_ids monotone across
    batches => streamed survivors == the batch operator over the
    union, modulo the documented survivor-chain caveat every ingest
    twin shares (state holds SURVIVORS only; the batch both-sides rule
    compares against dropped pairs too).
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        threshold: float = 0.5,
        n: int = 3,
        num_hashes: int = 64,
        bands: int = 32,
        n_buckets: int = 32,
    ) -> None:
        import os

        self._sides = {
            col: IngestNearDedup(
                spark,
                os.path.join(state_dir, col),
                "pair_id",
                col,
                n=n,
                num_hashes=num_hashes,
                bands=bands,
                threshold=threshold,
                n_buckets=n_buckets,
            )
            for col in ("chosen", "rejected")
        }

    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> DataFrame:
        matches = {
            col: side.match_pairs(batch_df)
            for col, side in self._sides.items()
        }
        ch_cross, ch_within = matches["chosen"][0], matches["chosen"][1]
        rj_cross, rj_within = matches["rejected"][0], matches["rejected"][1]
        # both-sides rule: the SAME (id_a, id_b) pairing must match on
        # chosen and rejected — id_b is the batch casualty in both
        # orientations (match_pairs' contract)
        dominated = (
            ch_cross.join(rj_cross, ["id_a", "id_b"])
            .select("id_b")
            .unionByName(
                ch_within.join(rj_within, ["id_a", "id_b"]).select("id_b")
            )
            .select(F.col("id_b").alias("pair_id"))
            .dropDuplicates()
        )
        survivors = batch_df.join(
            dominated, ["pair_id"], "left_anti"
        ).localCheckpoint(eager=True)
        for col, side in self._sides.items():
            _, _, gd, buckets = matches[col]
            side.commit(survivors, gd, buckets)
        return survivors

    def foreach_batch(self, sink):
        """Adapter for ``writeStream.foreachBatch``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            sink(self.process_batch(batch_df, epoch_id), epoch_id)

        return fn

    def compact(self) -> dict[str, int]:
        """Compact both sides' state tables."""
        out: dict[str, int] = {}
        for col, side in self._sides.items():
            for k, v in side.compact().items():
                out[f"{col}/{k}"] = v
        return out


class IngestPrefCuration:
    """Conversations in, surviving PREFERENCE pairs out — one
    foreachBatch closing the preference family's streaming remainder
    (VERDICT r10 #7):

        IngestConvCuration (role-scoped durable turn near-dedup +
        optional frozen response decontamination; dedup_roles =
        ("assistant",) so identical user instructions — the assembly
        grouping key — pass through)
          -> per-batch preference-pair ASSEMBLY
             (functions/preference.py preference_pairs)
          -> IngestPrefPairDedup (durable BOTH-SIDES cross-batch pair
             near-dedup).

    Equivalence regime (each twin documents its own): pair assembly is
    corpus-global in batch (groupBy instruction), so streamed == batch
    additionally requires every instruction's candidate responses to
    arrive within ONE micro-batch (upstream sessionization keyed on the
    instruction — the availableNow/session-window pattern). Instruction
    groups that span batches assemble per-batch pairs instead; turn
    dedup and pair dedup remain cross-batch-correct regardless, which
    is why assembly alone was left un-incrementalized in r9 (module
    docstring) — this composition makes the regime explicit instead of
    leaving the lane batch-only.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        conv_col: str = "conv_id",
        turns_col: str = "turns",
        turn_threshold: float = 0.9,
        pair_threshold: float = 0.5,
        n: int = 3,
        num_hashes: int = 64,
        bands: int = 32,
        frozen_grams_path: str | None = None,
        decon_n: int = 8,
        n_buckets: int = 32,
    ) -> None:
        import os

        # turn dedup at a HIGHER threshold than pair dedup by default:
        # the turn state collapses near-verbatim canned responses; the
        # pair state owns the looser reworded-pair rule. With equal
        # thresholds the turn stage would eat every cross-batch pair
        # near-dup before the pair stage could apply its BOTH-SIDES
        # rule (a single-side match must SHIP — the reward signal
        # differs).
        self._conv = IngestConvCuration(
            spark,
            os.path.join(state_dir, "turns"),
            conv_col=conv_col,
            turns_col=turns_col,
            near_threshold=turn_threshold,
            n=n,
            num_hashes=num_hashes,
            bands=bands,
            frozen_grams_path=frozen_grams_path,
            decon_n=decon_n,
            n_buckets=n_buckets,
            dedup_roles=("assistant",),
        )
        self._pref = IngestPrefPairDedup(
            spark,
            os.path.join(state_dir, "pairs"),
            threshold=pair_threshold,
            n=n,
            num_hashes=num_hashes,
            bands=bands,
            n_buckets=n_buckets,
        )

    def process_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> DataFrame:
        from kafka_denormalization_spark.functions.preference import (
            preference_pairs,
        )

        sft = self._conv.process_batch(batch_df, epoch_id)
        prefs = preference_pairs(sft).localCheckpoint(eager=True)
        return self._pref.process_batch(prefs, epoch_id)

    def foreach_batch(self, sink):
        """Adapter for ``writeStream.foreachBatch``."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            sink(self.process_batch(batch_df, epoch_id), epoch_id)

        return fn

    def compact(self) -> dict[str, int]:
        out = {f"turns/{k}": v for k, v in self._conv.compact().items()}
        for k, v in self._pref.compact().items():
            out[f"pairs/{k}"] = v
        return out
