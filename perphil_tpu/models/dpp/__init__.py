from perphil_tpu.models.dpp.parameters import DPPParameters

__all__ = ["DPPParameters"]
