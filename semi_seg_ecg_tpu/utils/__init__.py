from . import checkpoint, logging, lr_decay, lr_sched, optimizer  # noqa: F401
