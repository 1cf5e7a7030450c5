from crawling_infrastructure_spark.functions.html import (  # noqa: F401
    clean_html,
    extract_links,
    extract_links_col,
    extract_text,
)
from crawling_infrastructure_spark.functions.url import (  # noqa: F401
    canonicalize_url,
    canonicalize_url_col,
    host_col,
    host_of,
    registrable_domain,
    url_hash_col,
)
