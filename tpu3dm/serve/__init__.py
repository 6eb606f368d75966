from tpu3dm.serve.client import RegistrationClient
from tpu3dm.serve.engine import EngineOverloaded, PairResult, ServeConfig, ServeEngine
from tpu3dm.serve.server import RegistrationServer

__all__ = [
    "EngineOverloaded",
    "PairResult",
    "RegistrationClient",
    "RegistrationServer",
    "ServeConfig",
    "ServeEngine",
]
