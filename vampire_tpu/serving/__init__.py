from .server import (InferenceServer, ReplicaPool, serve_tcp,  # noqa: F401
                     TcpClient)
