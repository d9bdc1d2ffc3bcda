from .expr import compile_expr, ExprError  # noqa: F401
from .spec import (Action, FlowSpec, FlowStore, Mapper, Peer,  # noqa: F401
                   parse_bang_mapper)
from .runtime import FlowRuntime, WORKER_REGISTRY, register_worker  # noqa: F401
from .http_api import make_server, serve, spec_to_json  # noqa: F401
from .daemon import FlowDaemon, serve_daemon  # noqa: F401
