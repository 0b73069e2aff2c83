from hylight_tpu.utils.log import get_logger, stage  # noqa: F401
