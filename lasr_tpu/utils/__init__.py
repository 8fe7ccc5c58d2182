from lasr_tpu.utils.registry import BaseConfig, Register, dynamic_import

__all__ = ["BaseConfig", "Register", "dynamic_import"]
