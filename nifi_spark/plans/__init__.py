"""Flow plans — NiFi's processor graph as a declarative DataFrame DAG.

NiFi users draw Processors connected by named Relationships
(nifi-api/.../processor/Processor.java:50-89, Relationship.java:23) and
the framework runs the graph as drawn (no optimizer —
StandardFlowSynchronizer.java serializes flow.xml.gz). Here the graph is
declared in code, every stage is a function over DataFrames, and the
*composed* plan is handed to Catalyst whole — so filters/projections
still push down across stage boundaries, which NiFi's materialized
queues structurally prevent.
"""

from nifi_spark.plans.flow import Flow, FlowError
from nifi_spark.plans.scripted import (ScriptedProcessor, ScriptError,
                                       compile_script,
                                       compile_script_properties,
                                       register_processor,
                                       registered_processor)
from nifi_spark.plans.sqlexec import SqlEngine
from nifi_spark.plans.template_loader import (TemplateError, load_flow_xml,
                                              load_template, parse_flow_xml,
                                              parse_template)

__all__ = ["Flow", "FlowError", "ScriptError", "ScriptedProcessor",
           "SqlEngine", "TemplateError",
           "compile_script", "compile_script_properties",
           "load_flow_xml", "load_template", "parse_flow_xml", "parse_template",
           "register_processor", "registered_processor"]
