"""Streaming shell: micro-batch CDC pipeline with checkpointed exactly-once.

``pipeline`` drives one keyed target table; ``fanout`` routes one
heterogeneous stream to N of them; ``stateful``/``windows`` hold the
stateful streaming operators (first-seen dedup, session windows).
"""

from commons_codec_spark.streaming.fanout import (  # noqa: F401
    MultiTablePipeline,
    TableTarget,
)
from commons_codec_spark.streaming.pipeline import (  # noqa: F401
    CDCPipeline,
    PipelineConfig,
)
