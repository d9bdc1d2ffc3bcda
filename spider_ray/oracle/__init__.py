from .crawler import OracleCrawler, CrawlResult, crawl_oracle  # noqa: F401
