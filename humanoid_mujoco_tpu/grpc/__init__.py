"""gRPC wire protocol for the Agent service (mjpc/grpc analog).

`agent.proto` defines the verb surface (reference agent.proto:19-60);
`agent_pb2.py` is protoc gencode (regenerate with gen.sh). The server
and client live in serving/grpc_server.py and serving/grpc_client.py.
"""

from . import agent_pb2

__all__ = ["agent_pb2"]
