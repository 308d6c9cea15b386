"""Query modules — importing this package registers every query into
``blspark.catalog``. Modules are grouped by SURVEY.md §2 area."""

import blspark.queries.advanced  # noqa: F401
import blspark.queries.analytics  # noqa: F401
import blspark.queries.analytics2  # noqa: F401
import blspark.queries.core  # noqa: F401
import blspark.queries.events  # noqa: F401
import blspark.queries.joins2  # noqa: F401
import blspark.queries.sessions  # noqa: F401
import blspark.queries.sync_q  # noqa: F401
import blspark.queries.tpch_like  # noqa: F401
import blspark.queries.tpch_like2  # noqa: F401
import blspark.queries.extensions  # noqa: F401
import blspark.queries.extensions2  # noqa: F401
import blspark.queries.extensions3  # noqa: F401
import blspark.queries.extensions4  # noqa: F401
import blspark.queries.extensions5  # noqa: F401
import blspark.queries.extensions6  # noqa: F401
import blspark.queries.extensions7  # noqa: F401
import blspark.queries.extensions8  # noqa: F401
import blspark.queries.extensions9  # noqa: F401
import blspark.queries.extensions10  # noqa: F401
import blspark.queries.extensions11  # noqa: F401
import blspark.queries.extensions12  # noqa: F401
import blspark.queries.extensions13  # noqa: F401
import blspark.queries.extensions14  # noqa: F401
import blspark.queries.extensions15  # noqa: F401
import blspark.queries.extensions16  # noqa: F401
import blspark.queries.streaming_q  # noqa: F401
