from nifi_spark.functions.el import EL
from nifi_spark.functions.portable_hash import portable_hash64

__all__ = ["EL", "portable_hash64"]
