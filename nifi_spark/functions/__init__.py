from nifi_spark.functions.el import EL
from nifi_spark.functions.el_parser import (ELSyntaxError, compile_el,
                                            compile_template)
from nifi_spark.functions.portable_hash import portable_hash64

__all__ = ["EL", "ELSyntaxError", "compile_el", "compile_template",
           "portable_hash64"]
