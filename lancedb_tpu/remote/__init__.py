from .client import (
    ClientConfig,
    RemoteDBConnection,
    RemoteTable,
    RetryConfig,
    TimeoutConfig,
    connect_remote,
)
from .oauth import OAuthConfig, OAuthHeaderProvider
from .server import QueryServer

__all__ = [
    "connect_remote",
    "RemoteDBConnection",
    "RemoteTable",
    "QueryServer",
    "ClientConfig",
    "RetryConfig",
    "TimeoutConfig",
    "OAuthConfig",
    "OAuthHeaderProvider",
]
