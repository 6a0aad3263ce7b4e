from .rollout import residual_lstm_rollout
