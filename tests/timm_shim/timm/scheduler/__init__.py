from . import cosine_lr, scheduler, step_lr  # noqa: F401
