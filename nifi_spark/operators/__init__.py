"""Operator library — NiFi processor semantics as DataFrame combinators.

Every "processor" here is a plain function DataFrame → DataFrame (or a dict
of named relationship DataFrames), matching NiFi's Processor.onTrigger +
named-Relationship contract (nifi-api/src/main/java/org/apache/nifi/
processor/Processor.java:50-89, Relationship.java:23) while leaving the
physical plan entirely to Catalyst.
"""

from nifi_spark.operators.routing import (debug_flow,
                                          fetch_map_cache, put_map_cache,
                                          route_on_attribute,
                                          route_on_content, route_tag,
                                          route_text, scan_attribute,
                                          scan_content)
from nifi_spark.operators.attributes import (attributes_to_json,
                                             global_sequence, hash_attribute,
                                             hash_content, stateful_counter,
                                             update_columns)
from nifi_spark.operators.content import (duplicate_flowfile,
                                          bin_assign, bin_pack,
                                          evaluate_json_path,
                                          evaluate_xpath, extract_text,
                                          identify_mime_type,
                                          merge_defragment, parse_cef,
                                          parse_syslog, replace_text,
                                          replace_text_with_mapping,
                                          reshape_json, segment_content,
                                          split_json_array, split_text,
                                          split_text_grouped,
                                          split_xml, validate_csv,
                                          validate_csv_cells,
                                          validate_xml, merge_concat)
from nifi_spark.operators.codec import (compress_content,
                                        encrypt_content_pbe,
                                        convert_character_set,
                                        decode_content, decrypt_content,
                                        encode_content, encrypt_content,
                                        modify_bytes, split_content,
                                        unpack_content)
from nifi_spark.operators.http_invoke import (invoke_http,
                                              route_http_response)
from nifi_spark.operators.flowfile_pack import (package_flowfiles,
                                                unpack_flowfiles)
from nifi_spark.operators.formats import (avro_available, convert_format,
                                          convert_schema, infer_ddl)
from nifi_spark.operators.avro_codec import (avro_to_records,
                                             extract_avro_metadata,
                                             read_avro_path, records_to_avro,
                                             write_avro_path)
from nifi_spark.operators.dedup import detect_duplicate, latest_wins
from nifi_spark.operators.evtx import (build_evtx, evtx_chunk_status,
                                       parse_evtx, parse_evtx_chunks)
from nifi_spark.operators.jolt import jolt_apply, jolt_transform
from nifi_spark.operators.xml_transform import evaluate_xquery, transform_xml
from nifi_spark.operators.distribute import (distribute_load, enforce_order,
                                             prioritize,
                                             repartition_by_key_range,
                                             salt_keys)
from nifi_spark.operators.exec_command import (execute_process,
                                                execute_stream_command)
from nifi_spark.operators.rate import control_rate, monitor_activity

from nifi_spark.operators.email_ops import (extract_email_attachments,
                                             extract_email_headers,
                                             synthesize_email)
from nifi_spark.operators.enrich import (geo_enrich_ip, query_dns,
                                         query_whois)
from nifi_spark.operators.hl7 import (HL7Query, extract_hl7_attributes,
                                      parse_hl7, route_hl7)
from nifi_spark.operators.tnef import (build_tnef,
                                       extract_tnef_attachments,
                                       parse_tnef)
from nifi_spark.operators.json_sql import (convert_json_to_sql,
                                           generate_sql_for_record)
from nifi_spark.operators.html_ops import (get_html_element,
                                           modify_html_element,
                                           put_html_element)
from nifi_spark.operators.xml_split_depth import split_xml_depth

__all__ = [
    "route_on_attribute", "route_on_content", "route_tag", "route_text",
    "debug_flow", "scan_attribute", "scan_content",
    "fetch_map_cache", "put_map_cache",
    "attributes_to_json", "global_sequence", "hash_attribute",
    "hash_content", "stateful_counter", "update_columns",
    "bin_assign", "bin_pack", "evaluate_json_path", "evaluate_xpath",
    "extract_text", "identify_mime_type", "merge_defragment", "parse_cef",
    "parse_syslog", "replace_text", "replace_text_with_mapping",
    "duplicate_flowfile", "reshape_json", "segment_content",
    "split_json_array", "split_text", "split_text_grouped",
    "split_xml", "validate_csv", "validate_csv_cells", "validate_xml",
    "compress_content", "convert_character_set", "decode_content",
    "decrypt_content", "encode_content", "encrypt_content",
    "encrypt_content_pbe", "modify_bytes",
    "invoke_http", "route_http_response",
    "split_content", "unpack_content", "package_flowfiles",
    "unpack_flowfiles",
    "avro_available", "convert_format", "convert_schema", "infer_ddl",
    "avro_to_records", "extract_avro_metadata", "read_avro_path",
    "records_to_avro", "write_avro_path",
    "detect_duplicate", "latest_wins",
    "build_evtx", "evtx_chunk_status", "parse_evtx", "parse_evtx_chunks",
    "jolt_apply", "jolt_transform",
    "evaluate_xquery", "transform_xml",
    "distribute_load", "enforce_order", "prioritize",
    "repartition_by_key_range", "salt_keys",
    "control_rate",
    "execute_process", "execute_stream_command",
    "monitor_activity",
    "extract_email_attachments", "extract_email_headers",
    "synthesize_email", "geo_enrich_ip", "query_dns", "query_whois",
    "HL7Query", "extract_hl7_attributes", "parse_hl7", "route_hl7",
    "build_tnef", "extract_tnef_attachments", "parse_tnef",
    "convert_json_to_sql", "generate_sql_for_record",
    "get_html_element", "modify_html_element", "put_html_element",
    "split_xml_depth", "merge_concat",
]
