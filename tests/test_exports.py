"""Public API surface lock (mirrors the reference's test/exports.spec.ts:
the exported surface is a contract, breakage is a test failure)."""

from __future__ import annotations


def test_public_api_surface():
    import gnarly_spark
    from gnarly_spark import (
        catalog, catalog_training, datagen, fixtures, quality, reducers, session,
    )
    from gnarly_spark.functions import extraction, langid, paths, text, url
    from gnarly_spark.operators import audit, dedup, fold, multimodal, replay, similarity
    from gnarly_spark.sinks import lake
    from gnarly_spark.sources import changelog
    from gnarly_spark.streaming import pipeline, stateful, windows

    surface = {
        session: ["get_spark"],
        fixtures: [
            "ChainBuilder", "gen_changelog", "gen_page_edits",
            "oracle_final_state", "oracle_fold", "html_for",
            "CHANGELOG_DDL", "CHANGELOG_COLUMNS",
        ],
        extraction: ["extract_text", "extract_text_udf", "EXTRACTION_RULE_VERSION"],
        text: [
            "lang_id", "token_count", "bpe_ish_token_count", "quality_features",
            "fingerprint", "scrub_pii", "collapse_repeat_tokens",
            "lm_quality", "pack_sequences", "shard_assign", "write_shards",
            "bpe_token_count", "train_bpe_merges", "bpe_count_sql",
            "bpe_tokenize", "bpe_tokenize_sql",
        ],
        langid: [
            "lang_id_ngram", "train_model", "write_model", "load_model",
            "norm_expr", "oracle_sql_langid", "model_path", "LANGS",
            "SEED_TEXT",
        ],
        paths: ["parse_path"],
        url: [
            "canonicalize_url", "canonicalize_url_dropquery", "url_host",
            "canonicalize_url_sql", "url_host_sql",
        ],
        replay: [
            "final_state", "live_events", "reverted_blocks",
            "last_writer_wins", "last_writer_wins_salted",
            "last_writer_wins_window", "last_writer_wins_fetch", "scd2_history",
        ],
        fold: ["fold_deltas", "fold_final_state"],
        audit: ["audit_rows", "AUDIT_COLUMNS"],
        dedup: [
            "exact_duplicates", "shingles", "jaccard_pairs",
            "minhash_signatures", "minhash_lsh_pairs", "simhash",
            "incremental_lsh_dups",
            "winnow_fingerprints", "normalize_text", "cap_hot_shingles",
            "duplicate_clusters", "simhash_hamming_pairs", "cap_hot_bands",
            "repeated_spans", "strip_repeated_spans",
            "combination_key_bits",
        ],
        similarity: [
            "cosine_topk", "neardup_pairs", "neardup_pairs_lsh", "lsh_sketch",
            "lsh_ann_topk",
            "ivf_build", "ivf_ann_topk", "cosine", "quantize_vectors",
        ],
        multimodal: [
            "media_metadata", "extract_media_features",
            "media_repartition_by_bytes", "sample_frames",
            "extract_image_dims", "decode_image_header", "extract_av_metadata",
            "extract_av_frames", "ffmpeg_available",
        ],
        lake: [
            "ParquetLakeTable", "IcebergLakeTable", "bucket_of",
            "build_merge_source", "build_merge_sql", "CommitConflict",
        ],
        changelog: [
            "read_changelog", "stream_changelog", "order_files_by_name",
            "block_by_seq", "block_by_hash", "latest_seq", "events_in_range",
        ],
        pipeline: ["CdcIngestPipeline", "TARGET_COLUMNS"],
        stateful: ["head_tracker", "head_tracker_v2", "STATE_SCHEMA", "OUTPUT_SCHEMA"],
        windows: ["windowed_lang_rates"],
        reducers: ["AppendReducer", "FoldReducer", "IdempotentReducer"],
        datagen: ["gen_changelog_spark"],
        catalog: ["QUERIES", "ORACLES", "register"],
        quality: [
            "Expectation", "UniqueKey", "evaluate_expectations",
            "gate_and_publish", "QualityGateError",
        ],
    }
    for mod, names in surface.items():
        for n in names:
            assert hasattr(mod, n), f"{mod.__name__}.{n} missing from public surface"
    assert gnarly_spark.__version__
