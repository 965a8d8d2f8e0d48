from perphil_tpu.forms.spaces import (
    Function,
    FunctionSpace,
    IndexedFunctionSpace,
    MixedFunctionSpace,
    create_function_spaces,
    mixed_space,
)
from perphil_tpu.forms.dpp import (
    dpp_delayed_form,
    dpp_form,
    dpp_splitted_form,
)

__all__ = [
    "Function",
    "FunctionSpace",
    "IndexedFunctionSpace",
    "MixedFunctionSpace",
    "create_function_spaces",
    "mixed_space",
    "dpp_form",
    "dpp_delayed_form",
    "dpp_splitted_form",
]
