from .decoding import greedy_over_frames, greedy_search, modified_beam_search
from .metrics import edit_distance, token_error_rate
from .serving import StreamServer
from .streaming import (
    StreamingConfig,
    streaming_init,
    streaming_reset,
    streaming_step,
)
from .training import (
    LossConfig,
    init_model,
    make_boundary,
    make_train_step,
    pruned_transducer_loss,
)
from .transducer import (
    Encoder,
    Joiner,
    Predictor,
    PrunedTransducer,
    TransducerConfig,
)

__all__ = [
    "Encoder",
    "Joiner",
    "LossConfig",
    "Predictor",
    "PrunedTransducer",
    "TransducerConfig",
    "greedy_over_frames",
    "greedy_search",
    "init_model",
    "StreamServer",
    "StreamingConfig",
    "edit_distance",
    "token_error_rate",
    "streaming_init",
    "streaming_reset",
    "streaming_step",
    "modified_beam_search",
    "make_boundary",
    "make_train_step",
    "pruned_transducer_loss",
]
