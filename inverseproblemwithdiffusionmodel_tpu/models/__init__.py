from .ema import EmaState
