"""calendar_event_entity_extraction_spark — a PySpark-native knowledge-graph
construction engine.

Re-implements the extraction semantics of the reference repo
``muskaanwalia098/Calendar-Event-Entity-Extraction`` (a single-process
LoRA/SmolLM fine-tuning pipeline, see ``/root/reference``) as a distributed,
deterministic, vectorized triple pipeline over a transcripts table
``(conv_id, turn_idx, role, text, tool, ts)``:

    transcripts ──detect──▶ calendar-request turns
               ──extract──▶ 8-field event struct   (pure Column exprs / Arrow)
               ──explode──▶ (event_id, pred, obj, obj_idx) triples
               ──link─────▶ entity-linked triples  (broadcast dict + salted dedup)
               ──canon────▶ co-referent event merge (window over conv_id/turn_idx)
               ──write────▶ partitioned node/edge tables + lineage manifests

Everything is Spark-first: DataFrame/SQL declarative plans, Catalyst handles
pushdown/pruning/join strategy; no per-row Python on executors.
"""

__version__ = "0.1.0"
