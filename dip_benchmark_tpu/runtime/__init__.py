from .device import (  # noqa: F401
    DeviceGateError,
    DeviceGateTimeout,
    backend_name,
    default_device,
    describe_device,
    gate_backend,
    require_device,
)
