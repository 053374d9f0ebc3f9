from . import conversation, pave, tokenizer, transforms  # noqa: F401
