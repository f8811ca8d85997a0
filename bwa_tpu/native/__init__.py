from bwa_tpu.native.build import get_lib  # noqa: F401
