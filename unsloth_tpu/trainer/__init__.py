from .dpo import (BCOConfig, BCOTrainer, CPOConfig, CPOTrainer,
                  DPOConfig, DPOTrainer, KTOConfig, KTOTrainer,
                  ORPOConfig, ORPOTrainer, PatchDPOTrainer)
from .grpo import (GRPOConfig, GRPOTrainer, PatchFastRL, RLOOConfig,
                   RLOOTrainer)
from .gkd import GKDConfig, GKDTrainer
from .ppo import PPOConfig, PPOTrainer
from .prm import PRMConfig, PRMTrainer
from .online_dpo import OnlineDPOConfig, OnlineDPOTrainer
from .reward import RewardConfig, RewardTrainer
from .sft import (SFTConfig, SFTTrainer, TrainOutput, build_optimizer,
                  build_schedule, make_config, train_on_responses_only,
                  unsloth_train)

# Reference-parity aliases (reference: unsloth/trainer.py exports
# UnslothTrainer / UnslothTrainingArguments).
UnslothTrainer = SFTTrainer
UnslothTrainingArguments = SFTConfig

__all__ = [
    "SFTConfig", "SFTTrainer", "TrainOutput", "build_optimizer",
    "build_schedule", "make_config", "train_on_responses_only",
    "unsloth_train",
    "UnslothTrainer", "UnslothTrainingArguments",
    "GRPOConfig", "GRPOTrainer", "PatchFastRL",
    "DPOConfig", "DPOTrainer", "PatchDPOTrainer",
    "ORPOConfig", "ORPOTrainer", "KTOConfig", "KTOTrainer",
    "CPOConfig", "CPOTrainer",
    "RewardConfig", "RewardTrainer",
    "RLOOConfig", "RLOOTrainer",
    "OnlineDPOConfig", "OnlineDPOTrainer",
    "GKDConfig", "GKDTrainer",
    "PPOConfig", "PPOTrainer",
    "PRMConfig", "PRMTrainer",
    "BCOConfig", "BCOTrainer",
]
