from . import losses, metrics
from .retrieval import (TokenWindowContext, WindowRefContext,
                        build_token_window_ctx, encode_window_refs, retrieve,
                        retrieve_tokens)
from .sharded_retrieval import (ShardedWindowRefContext,
                                encode_window_refs_sharded, retrieve_sharded)
from .schedule import make_optimizer, warmup_inverse_sqrt
from .step import StepConfig, TrainState, eval_step, train_step
from .trainer import EarlyStopping, Trainer, TrainerConfig
