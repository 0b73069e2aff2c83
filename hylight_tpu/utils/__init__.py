from hylight_tpu.utils.log import STAGE_TIMES, get_logger, stage  # noqa: F401
