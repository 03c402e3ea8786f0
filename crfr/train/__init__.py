from crfr.train.loop import Trainer, lr_schedule  # noqa: F401
