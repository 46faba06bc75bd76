from svbrdf_tpu.interop.torch_port import port_torch_state_dict  # noqa: F401
