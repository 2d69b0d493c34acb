from .decoding import greedy_search, modified_beam_search
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
    "greedy_search",
    "init_model",
    "modified_beam_search",
    "make_boundary",
    "make_train_step",
    "pruned_transducer_loss",
]
