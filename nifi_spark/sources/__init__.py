"""Incremental sources — the CDC front-end (SURVEY.md §2.1).

Each source follows the same ledgered-watermark contract NiFi's stateful
source processors use (QueryDatabaseTable max-value columns, TailFile byte
positions, AbstractListProcessor listing timestamps): discover work past
the checkpoint, emit it as a DataFrame, and advance the checkpoint only
after the downstream commit.
"""

from nifi_spark.sources.amqp import (AmqpBroker, AmqpClient,
                                     ConsumeAMQPSource, amqp_loopback,
                                     publish_amqp)
from nifi_spark.sources.catalog import list_database_tables
from nifi_spark.sources.changelog import ChangelogSource
from nifi_spark.sources.files import fetch_files, get_files
from nifi_spark.sources.http import HttpIncrementalSource
from nifi_spark.sources.kafka import (KafkaBatchSource, kafka_available,
                                      next_starting_offsets, offsets_json,
                                      publish_kafka)
from nifi_spark.sources.listen import (ListenSource, ListenSyslogSource,
                                       ListenTCPSource, ListenUDPSource)
from nifi_spark.sources.tail_file import (MultiTailFileSource,
                                          TailFileSource)
from nifi_spark.sources.sns import (SnsClient, SnsError, SnsServer,
                                    put_sns)
from nifi_spark.sources.hdfs_events import (FakeInotifyStream,
                                            GetHDFSEventsSource,
                                            MissingEventsError)
from nifi_spark.sources.http_listen import (ListenHTTPSource,
                                            requests_feed, serve_http)
from nifi_spark.sources.imap import (ConsumeIMAPSource, imap_fetch,
                                     imap_loopback, serve_imap)
from nifi_spark.sources.listing import list_new_files
from nifi_spark.sources.couchbase import (CouchbaseBucket,
                                          CouchbaseClient, CouchbaseError,
                                          couchbase_loopback,
                                          get_couchbase_key,
                                          put_couchbase_key)
from nifi_spark.sources.ignite import (IgniteCache, get_ignite_cache,
                                       put_ignite_cache)
from nifi_spark.sources.riemann import (RiemannServer, decode_msg,
                                        encode_msg, put_riemann,
                                        riemann_loopback, row_to_event)
from nifi_spark.sources.slack import (SlackWebhookServer, put_slack)
from nifi_spark.sources.social import (ConsumeWindowsEventLogSource,
                                       FakeTranslator, GetTwitterSource,
                                       TwitterStreamServer,
                                       yandex_translate)
from nifi_spark.sources.hbase import (GetHBaseSource, HBaseTable,
                                      put_hbase_cell, put_hbase_json,
                                      serialize_row_json)
from nifi_spark.sources.splunk import (GetSplunkSource, SplunkServer,
                                       put_splunk)
from nifi_spark.sources.map_cache import (MapCacheClient, PersistentMapCache,
                                          SetCacheClient, SimpleMapCache,
                                          SimpleSetCache, cache_loopback,
                                          fetch_into_column, put_from_rows)
from nifi_spark.sources.lumberjack import (ListenLumberjackSource,
                                           serve_lumberjack)
from nifi_spark.sources.mqtt import (ConsumeMQTTSource, MqttBroker,
                                     MqttClient, mqtt_loopback)
from nifi_spark.sources.relp import (ListenRELPSource, RelpDecoder,
                                     serve_relp)
from nifi_spark.sources.snmp import (SnmpAgent, SnmpV3Agent,
                                     SnmpV3Session, localize_key,
                                     password_to_key, snmp_get,
                                     snmp_set, snmp_v3_discover,
                                     snmp_walk)
from nifi_spark.sources.websocket import (ListenWebSocketSource, WsClient,
                                          serve_websocket, ws_loopback)
from nifi_spark.sources.pop3 import (ConsumePOP3Source, pop3_fetch,
                                     pop3_loopback, serve_pop3)
from nifi_spark.sources.smtp_listen import (ListenSMTPSource,
                                            compose_rfc822,
                                            lines_feed, put_email,
                                            serve_smtp, smtp_send)
from nifi_spark.sources.partition_planner import plan_fetch_partitions
from nifi_spark.sources.s2s_http import (S2SHttpClient, S2SHttpServer)
from nifi_spark.sources.put_socket import (build_syslog_message,
                                           put_syslog, put_tcp,
                                           put_udp, sent_feed,
                                           syslog_is_valid)
from nifi_spark.sources.stomp import (GetJMSSource, StompBroker,
                                      StompClient, put_jms,
                                      stomp_loopback)
from nifi_spark.sources.kafka_wire import (ConsumeKafkaWireSource,
                                           KafkaBroker, KafkaWireClient,
                                           kafka_loopback,
                                           partition_for_key)
from nifi_spark.sources.amqp10 import (Amqp10Error,
                                       EventHubBroker, EventHubClient,
                                       EventHubReceiver,
                                       GetEventHubSource,
                                       eventhub_loopback, put_eventhub)
from nifi_spark.sources.elasticsearch import (EsClient, EsError,
                                              EsNotFound,
                                              EsRetryableError,
                                              EsServer, QueryEsSource,
                                              ScrollEsSource)
from nifi_spark.sources.mongo import (GetMongoSource, MongoClient,
                                      MongoServer, ObjectId,
                                      mongo_loopback)
from nifi_spark.sources.cql import (CqlClient, CqlServer,
                                    QueryCassandraSource, cql_loopback,
                                    put_cassandra_ql)
from nifi_spark.sources.sqs import (GetSQSSource, SqsClient, SqsError,
                                    SqsServer, sigv4_sign, sigv4_verify)
from nifi_spark.sources.s3 import (ListS3Source, S3Client, S3Error,
                                   S3Server)
from nifi_spark.sources.solr import (GetSolrSource, SolrClient,
                                     SolrServer, put_solr)
from nifi_spark.sources.webhdfs import (ListHDFSSource, WebHdfsClient,
                                        fake_hdfs_transport)
from nifi_spark.sources.site_to_site import (DataPacket, S2SClient,
                                             S2SPort, S2STransaction,
                                             loopback_serve,
                                             serve_connection,
                                             weighted_peer_destinations)

__all__ = ["ChangelogSource", "HttpIncrementalSource", "KafkaBatchSource",
           "fetch_files", "get_files",
           "kafka_available", "next_starting_offsets", "offsets_json",
           "publish_kafka",
           "ListenSource", "ListenSyslogSource", "ListenTCPSource",
           "ListenUDPSource", "TailFileSource", "MultiTailFileSource",
           "SnsClient", "SnsError", "SnsServer", "put_sns",
           "FakeInotifyStream", "GetHDFSEventsSource", "MissingEventsError",
           "DataPacket", "S2SClient", "S2SPort", "S2STransaction",
           "loopback_serve", "serve_connection", "weighted_peer_destinations",
           "S2SHttpClient", "S2SHttpServer",
           "ListenSMTPSource", "lines_feed", "serve_smtp",
           "ConsumePOP3Source", "pop3_fetch", "pop3_loopback",
           "serve_pop3", "compose_rfc822", "put_email", "smtp_send",
           "ListenHTTPSource", "requests_feed", "serve_http",
           "ListenWebSocketSource", "WsClient", "serve_websocket",
           "ws_loopback",
           "ListenRELPSource", "RelpDecoder", "serve_relp",
           "ListenLumberjackSource", "serve_lumberjack",
           "ConsumeMQTTSource", "MqttBroker", "MqttClient",
           "mqtt_loopback",
           "AmqpBroker", "AmqpClient", "ConsumeAMQPSource",
           "amqp_loopback", "publish_amqp",
           "ConsumeIMAPSource", "imap_fetch", "imap_loopback",
           "serve_imap",
           "SnmpAgent", "SnmpV3Agent", "SnmpV3Session", "localize_key",
           "password_to_key", "snmp_get", "snmp_set",
           "snmp_v3_discover", "snmp_walk",
           "GetSplunkSource", "SplunkServer", "put_splunk",
           "CouchbaseBucket", "CouchbaseClient", "CouchbaseError",
           "couchbase_loopback", "get_couchbase_key", "put_couchbase_key",
           "IgniteCache", "get_ignite_cache", "put_ignite_cache",
           "RiemannServer", "decode_msg", "encode_msg", "put_riemann",
           "riemann_loopback", "row_to_event",
           "SlackWebhookServer", "put_slack",
           "ConsumeWindowsEventLogSource", "FakeTranslator",
           "GetTwitterSource", "TwitterStreamServer", "yandex_translate",
           "GetHBaseSource", "HBaseTable", "put_hbase_cell",
           "put_hbase_json", "serialize_row_json",
           "MapCacheClient", "PersistentMapCache", "SetCacheClient",
           "SimpleMapCache", "SimpleSetCache", "cache_loopback",
           "fetch_into_column", "put_from_rows",
           "list_database_tables", "list_new_files",
           "plan_fetch_partitions",
           "build_syslog_message", "put_syslog", "put_tcp", "put_udp",
           "sent_feed", "syslog_is_valid",
           "GetJMSSource", "StompBroker", "StompClient", "put_jms",
           "stomp_loopback",
           "ConsumeKafkaWireSource", "KafkaBroker", "KafkaWireClient",
           "kafka_loopback", "partition_for_key",
           "ListHDFSSource", "WebHdfsClient", "fake_hdfs_transport",
           "GetMongoSource", "MongoClient", "MongoServer", "ObjectId",
           "mongo_loopback",
           "CqlClient", "CqlServer", "QueryCassandraSource",
           "cql_loopback",
           "GetSQSSource", "SqsClient", "SqsError", "SqsServer",
           "sigv4_sign", "sigv4_verify",
           "GetSolrSource", "SolrClient", "SolrServer", "put_solr",
           "put_cassandra_ql",
           "Amqp10Error", "EventHubBroker", "EventHubClient", "EventHubReceiver",
           "GetEventHubSource", "eventhub_loopback", "put_eventhub",
           "EsClient", "EsError", "EsNotFound", "EsRetryableError",
           "EsServer", "QueryEsSource", "ScrollEsSource",
           "ListS3Source", "S3Client", "S3Error", "S3Server"]
