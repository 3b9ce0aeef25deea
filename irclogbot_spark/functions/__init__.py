from irclogbot_spark.functions.hashing import (  # noqa: F401
    blake2b_id,
    blake2b_id_with_posted,
    scale_id,
)
from irclogbot_spark.functions.scalar import human_fmt, iso_posted  # noqa: F401
