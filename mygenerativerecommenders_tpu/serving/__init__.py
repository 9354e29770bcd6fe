from mygenerativerecommenders_tpu.serving.service import (  # noqa: F401
    ServingEngine,
    RecommenderHTTPServer,
    serve,
)
