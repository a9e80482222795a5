from .server import InferenceServer, serve_tcp, TcpClient  # noqa: F401
