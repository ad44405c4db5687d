from dspfun_tpu.core.precision import Precision, get_precision, set_precision

__all__ = ["Precision", "get_precision", "set_precision"]
