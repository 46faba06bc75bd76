from svbrdf_tpu.interop.torch_port import (  # noqa: F401
    export_torch_state_dict, port_torch_state_dict)
