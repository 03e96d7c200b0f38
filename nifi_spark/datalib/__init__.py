"""datalib — large-scale training-data pipeline operators.

First-class components alongside the CDC engine: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity search
(brute-force cosine top-k + LSH-bucketed ANN), text analysis (language-ID,
quality scoring, token counting, fingerprinting), and multimodal column
plumbing (binary payloads + typed metadata with Arrow-batched UDFs).

Everything hash-valued uses the portable md5-derived hash
(nifi_spark.functions.portable_hash) so results are bit-identical across
Spark, DuckDB (driver correctness oracle), and numpy (pytest oracle).
"""

from nifi_spark.datalib.ngram_lm import (ngram_lm_oracle_sql,
                                         score_ngram_lm,
                                         train_ngram_counts)
from nifi_spark.datalib.cluster import (kmeans_int8,
                                        kmeans_oracle_sql,
                                        semantic_dedup,
                                        semantic_dedup_oracle_sql)
from nifi_spark.datalib.sketch import (bloom_bits, bloom_contains,
                                       cm_estimate, count_min_sketch,
                                       heavy_hitters, histogram_quantile,
                                       histogram_sketch, hll_estimate,
                                       hll_registers)
from nifi_spark.datalib.bpe import (bpe_encode, bpe_encode_oracle_sql,
                                    bpe_oracle_sql, bpe_train,
                                    wordpiece_oracle_sql, wordpiece_train)
from nifi_spark.datalib.ngram_lm import (ccnet_oracle_sql,
                                         ccnet_ppl_buckets)
from nifi_spark.datalib.unigram import (unigram_encode,
                                        unigram_encode_oracle_sql,
                                        unigram_seed_vocab,
                                        unigram_train,
                                        unigram_train_oracle_sql)
from nifi_spark.datalib.graph import (connected_components, pagerank,
                                      pagerank_oracle_sql)
from nifi_spark.datalib.pq import (ivf_assign, pq_adc_topk,
                                   pq_distance_table, pq_encode,
                                   pq_ivf_topk, pq_train,
                                   pq_train_encode_oracle_sql)
from nifi_spark.datalib.warc import (build_warc, parse_warc, split_warc,
                                     synthesize_warc, wet_documents)
from nifi_spark.datalib.curation import (benchmark_contamination,
                                         canonical_url,
                                         cap_per_group, dataset_split,
                                         pack_sequences,
                                         stratified_sample,
                                         temperature_mix,
                                         token_budget_sample,
                                         train_perceptron, url_dedup)
from nifi_spark.datalib.dedup import (build_dedup_index,
                                      contaminated_spans,
                                      dedup_incremental,
                                      exact_dedup, exact_substring_dedup,
                                      exact_substring_spans, lsh_band_plan,
                                      minhash_lsh_pairs,
                                      minhash_signatures, near_dup_clusters,
                                      ngram_jaccard_pairs, paragraph_dedup,
                                      shingle, simhash,
                                      simhash_pairs)
from nifi_spark.datalib.similarity import (ann_topk, cosine_pairs,
                                           embedding_near_dup_pairs,
                                           ivf_ann_topk, lsh_ann_topk,
                                           lsh_candidate_pairs,
                                           ann_topk_int8, quantize_int8)
from nifi_spark.datalib.text import (chunk_text, fingerprint,
                                     gopher_rules,
                                     gopher_rules_oracle_columns,
                                     html_to_text,
                                     lang_id, normalize_text,
                                     quality_classify,
                                     scrub_pii, url_stats,
                                     quality_score, repetition_stats,
                                     token_stats)

__all__ = ["contaminated_spans",
           "build_dedup_index", "connected_components", "dedup_incremental",
           "exact_dedup", "exact_substring_dedup", "exact_substring_spans",
           "lsh_band_plan", "minhash_lsh_pairs",
           "minhash_signatures", "near_dup_clusters", "ngram_jaccard_pairs",
           "paragraph_dedup", "shingle", "simhash", "simhash_pairs",
           "ann_topk", "cosine_pairs", "embedding_near_dup_pairs",
           "ivf_ann_topk", "lsh_ann_topk", "lsh_candidate_pairs", "quantize_int8", "ann_topk_int8",
           "fingerprint", "lang_id", "normalize_text",
           "gopher_rules", "gopher_rules_oracle_columns",
           "quality_classify", "quality_score", "scrub_pii",
           "repetition_stats",
           "token_stats", "url_stats",
           "benchmark_contamination", "canonical_url", "cap_per_group",
           "chunk_text", "dataset_split", "html_to_text", "pack_sequences", "stratified_sample",
           "token_budget_sample",
           "url_dedup", "train_perceptron", "pagerank",
           "pagerank_oracle_sql", "kmeans_int8", "kmeans_oracle_sql",
           "semantic_dedup", "semantic_dedup_oracle_sql",
           "ngram_lm_oracle_sql", "score_ngram_lm", "train_ngram_counts",
           "bpe_train", "bpe_encode", "bpe_oracle_sql",
           "bpe_encode_oracle_sql", "wordpiece_train",
           "unigram_seed_vocab", "unigram_encode", "unigram_train",
           "unigram_encode_oracle_sql", "unigram_train_oracle_sql",
           "ccnet_ppl_buckets", "ccnet_oracle_sql",
           "wordpiece_oracle_sql",
           "bloom_bits", "bloom_contains",
           "count_min_sketch", "cm_estimate", "hll_registers",
           "hll_estimate", "heavy_hitters", "histogram_sketch",
           "histogram_quantile", "build_warc", "parse_warc", "split_warc",
           "synthesize_warc", "wet_documents"]
