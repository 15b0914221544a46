from echr_tpu.ops.core import (  # noqa: F401
    dense,
    dense_init,
    dropout,
    uniform_init,
)
from echr_tpu.ops.masked import (  # noqa: F401
    masked_mean,
    masked_softmax,
    segment_mean,
    segment_window_mask,
)
from echr_tpu.ops.recurrent import (  # noqa: F401
    lstm_cell,
    lstm_cell_init,
    lstm_stack,
    lstm_stack_init,
)
from echr_tpu.ops.attention import (  # noqa: F401
    additive_attention_init,
    additive_attention_precompute,
    additive_attention_step,
)
