"""Operator layer.

Two tiers (SURVEY.md §4.2):

- **native** — pure DataFrame/SQL expressions that Catalyst optimizes and
  Tungsten codegen executes (filters, window math, aggregations, the
  linear-interp as-of join).  These shuffle at most once per logical
  group-by and push filters/projections into the parquet scan.
- **kernel** — grouped-map pandas UDFs over per-channel (or per-segment)
  groups for the genuinely sequential DSP math, backed by
  :mod:`pandas_sigproc_spark.kernels`.

All operators consume/produce the canonical ``signals`` / ``spectra``
column layout so they compose freely.
"""

from pandas_sigproc_spark.operators.relational import (
    between,
    timeshift,
    deduplicate,
    samplerate,
)
from pandas_sigproc_spark.operators.aggregates import (
    rms,
    spl,
    rms_lin,
    rms_log,
    segment_stats,
)
from pandas_sigproc_spark.operators.windows import (
    mov_rms,
    integral,
    derivative,
    detrend,
)
from pandas_sigproc_spark.operators.joins import (
    rss,
    interp1d_native,
    interp1d_linear,
    interp1d_log,
    resample,
    NATIVE_INTERP_KINDS,
)
from pandas_sigproc_spark.operators.filters import (
    filt_butter,
    filt_cfc,
    filt_a,
    filt_chunked,
    settling_length,
)
from pandas_sigproc_spark.operators.psd import get_psd
from pandas_sigproc_spark.operators.srs import get_srs
from pandas_sigproc_spark.operators.rainflow import rainflow, rainflow_chunked
from pandas_sigproc_spark.operators.interp_spline import interp1d_spline
from pandas_sigproc_spark.operators.graph import connected_components
from pandas_sigproc_spark.operators.ann import (
    cosine_topk_bruteforce,
    lsh_bucket_keys,
    lsh_topk,
    ivf_topk,
    int8_lsh_topk,
    ivf_pq_topk,
    pq_code_table,
    ivf_sq8_topk,
    embedding_near_pairs,
    centroids_from_kmeans,
)
from pandas_sigproc_spark.operators.text import (
    chunk_documents,
    normalize_text,
    normalize_text_expr,
    repetition_stats,
    tfidf_topk,
    substring_dedup,
)
from pandas_sigproc_spark.operators.kmeans import (
    kmeans_embeddings,
    kmeans_assignments,
    semantic_dedup,
)
from pandas_sigproc_spark.operators.dedup import (
    guard_bucket_rows,
    jaccard_near_dupes,
    jaccard_pairs,
    jaccard_ppjoin,
    lsh_band_tuning,
)
from .audiodup import (
    audio_fingerprints,
    audio_near_pairs,
    fingerprint_bytes,
    incremental_audio_dedup,
)
from .imagedup import (
    incremental_phash_dedup,
    phash_band_keys,
    phash_bytes,
    phash_pixels,
    phash_dedup,
    phash_frames,
    phash_images,
    phash_near_pairs,
    video_near_pairs,
)
from pandas_sigproc_spark.operators.packing import (
    assign_shards,
    pack_sequences,
    training_order,
)
from pandas_sigproc_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_relational,
    bpe_token_counts,
    bpe_train,
)
from pandas_sigproc_spark.operators.webdataset import (
    load_wds_shards,
    load_wds_store,
    save_wds_shards,
    save_wds_store,
    wds_members,
    wds_samples,
    write_wds_shards,
    zip_members,
)
from pandas_sigproc_spark.operators.dsir import (
    dsir_duckdb_sql,
    dsir_select,
    dsir_weights,
)
from pandas_sigproc_spark.operators.langid import lang_id_model
from pandas_sigproc_spark.operators.robots import (
    parse_robots,
    robots_verdicts,
    sitemap_directives,
)
from pandas_sigproc_spark.operators.linkgraph import pagerank
from pandas_sigproc_spark.operators.webcrawl import (
    canonicalize_url,
    cap_per_domain,
    domain_stats,
    html_escape,
    html_links,
    html_text,
    registrable_domain_expr,
    resolve_url,
    sitemap_kind,
    sitemap_locs,
    url_blocklist_filter,
    url_host,
    warc_documents,
    warc_records,
)
from pandas_sigproc_spark.operators.custom import apply_channel_kernel
from pandas_sigproc_spark.operators.sigstore import (
    SignatureStore,
    signature_tables,
    write_signature_store,
    read_signature_store,
    compact_signature_store,
    incremental_dedup_from_store,
    write_media_hash_store,
    read_media_hash_store,
    compact_media_hash_store,
    write_pq_code_store,
    read_pq_code_store,
    compact_pq_code_store,
)
from pandas_sigproc_spark.operators.curation import (
    block_dedup,
    cluster_representatives,
    compression_ratio,
    gopher_rules,
    quality_classifier,
    decontaminate_exact,
    build_bloom_bitmap,
    bloom_decontaminate,
    bloom_probe,
    bloom_sizing,
    BloomSizing,
    temperature_thresholds,
    temperature_sample,
    scrub_pii,
    incremental_dedup,
    minhash_sig_expr,
)

__all__ = [
    "between",
    "timeshift",
    "deduplicate",
    "samplerate",
    "rms",
    "spl",
    "rms_lin",
    "rms_log",
    "segment_stats",
    "mov_rms",
    "integral",
    "derivative",
    "detrend",
    "rss",
    "interp1d_native",
    "interp1d_linear",
    "interp1d_log",
    "resample",
    "NATIVE_INTERP_KINDS",
    "filt_butter",
    "filt_cfc",
    "filt_a",
    "filt_chunked",
    "settling_length",
    "get_psd",
    "get_srs",
    "rainflow",
    "rainflow_chunked",
    "interp1d_spline",
    "connected_components",
    "cosine_topk_bruteforce",
    "lsh_bucket_keys",
    "lsh_topk",
    "ivf_topk",
    "int8_lsh_topk",
    "ivf_pq_topk",
    "pq_code_table",
    "ivf_sq8_topk",
    "embedding_near_pairs",
    "centroids_from_kmeans",
    "guard_bucket_rows",
    "jaccard_near_dupes",
    "jaccard_pairs",
    "jaccard_ppjoin",
    "audio_fingerprints",
    "audio_near_pairs",
    "fingerprint_bytes",
    "incremental_audio_dedup",
    "lsh_band_tuning",
    "incremental_phash_dedup",
    "phash_band_keys",
    "phash_bytes",
    "phash_pixels",
    "phash_dedup",
    "phash_frames",
    "phash_images",
    "phash_near_pairs",
    "video_near_pairs",
    "pack_sequences",
    "assign_shards",
    "training_order",
    "dsir_duckdb_sql",
    "dsir_select",
    "dsir_weights",
    "bpe_train",
    "bpe_encode",
    "bpe_encode_relational",
    "bpe_token_counts",
    "load_wds_shards",
    "load_wds_store",
    "save_wds_shards",
    "save_wds_store",
    "wds_members",
    "wds_samples",
    "write_wds_shards",
    "zip_members",
    "warc_records",
    "warc_documents",
    "registrable_domain_expr",
    "resolve_url",
    "url_blocklist_filter",
    "url_host",
    "html_text",
    "html_escape",
    "html_links",
    "lang_id_model",
    "parse_robots",
    "robots_verdicts",
    "sitemap_directives",
    "sitemap_locs",
    "sitemap_kind",
    "pagerank",
    "canonicalize_url",
    "domain_stats",
    "cap_per_domain",
    "apply_channel_kernel",
    "chunk_documents",
    "repetition_stats",
    "tfidf_topk",
    "substring_dedup",
    "normalize_text",
    "normalize_text_expr",
    "kmeans_embeddings",
    "kmeans_assignments",
    "semantic_dedup",
    "block_dedup",
    "cluster_representatives",
    "compression_ratio",
    "gopher_rules",
    "quality_classifier",
    "decontaminate_exact",
    "build_bloom_bitmap",
    "bloom_decontaminate",
    "bloom_probe",
    "bloom_sizing",
    "BloomSizing",
    "SignatureStore",
    "signature_tables",
    "write_signature_store",
    "read_signature_store",
    "compact_signature_store",
    "incremental_dedup_from_store",
    "write_media_hash_store",
    "write_pq_code_store",
    "read_pq_code_store",
    "compact_pq_code_store",
    "read_media_hash_store",
    "compact_media_hash_store",
    "temperature_thresholds",
    "temperature_sample",
    "scrub_pii",
    "incremental_dedup",
    "minhash_sig_expr",
]
