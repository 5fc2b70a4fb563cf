"""Port of the crawl blacklists and default seed list.

Reference: ``src/jobs/Urls.java:12-232``. Order of the substring /
extension lists is preserved (evaluation order matters only for
short-circuiting, but we keep it for auditability).
"""
from __future__ import annotations

DEFAULT_SEEDS = [
    "https://en.wikipedia.org/wiki/Main_Page", "https://www.britannica.com/",
    "https://www.nationalgeographic.com/", "https://www.reuters.com/",
    "https://www.bbc.com/news", "https://www.npr.org/",
    "https://www.upenn.edu/", "https://www.stanford.edu/",
    "https://www.mit.edu/", "https://www.harvard.edu/",
    "https://www.nasa.gov/", "https://www.cdc.gov/", "https://www.noaa.gov/",
    "https://developer.mozilla.org/", "https://www.wikihow.com/",
    "https://www.history.com/", "https://www.howstuffworks.com/",
    "https://www.sciencedaily.com/", "https://www.poetryfoundation.org/",
    "https://www.goodreads.com/", "https://www.khanacademy.org/",
    "https://www.ted.com/", "https://www.quora.com/",
    "https://www.apnews.com/", "https://www.aljazeera.com/",
    "https://www.theguardian.com/", "https://www.nytimes.com/",
    "https://www.economist.com/", "https://www.washingtonpost.com/",
    "https://www.latimes.com/", "https://www.wsj.com/",
    "https://www.berkeley.edu/", "https://www.cornell.edu/",
    "https://www.yale.edu/", "https://www.princeton.edu/",
    "https://www.columbia.edu/", "https://www.caltech.edu/",
    "https://www.cam.ac.uk/", "https://www.ox.ac.uk/",
    "https://arxiv.org/", "https://www.science.org/",
    "https://www.scientificamerican.com/", "https://www.smithsonianmag.com/",
    "https://www.space.com/", "https://www.nature.com/",
    "https://www.acm.org/", "https://ieeexplore.ieee.org/",
    "https://stackoverflow.com/", "https://www.github.com/",
    "https://www.geeksforgeeks.org/", "https://www.w3schools.com/",
    "https://www.python.org/", "https://www.oracle.com/java/",
    "https://kubernetes.io/docs/", "https://www.linux.org/",
    "https://www.gnu.org/", "https://www.metmuseum.org/",
    "https://www.brookings.edu/", "https://www.archives.gov/",
    "https://www.loc.gov/", "https://www.usa.gov/",
    "https://www.whitehouse.gov/", "https://www.federalreserve.gov/",
    "https://www.sec.gov/", "https://www.energy.gov/", "https://www.nih.gov/",
    "https://www.lonelyplanet.com/", "https://www.travelandleisure.com/",
    "https://www.atlasobscura.com/", "https://www.fandom.com/",
    "https://www.imdb.com/", "https://www.gutenberg.org/",
    "https://www.stackexchange.com/", "https://www.openstreetmap.org/",
    "https://www.apple.com/", "https://www.healthline.com/",
]

BLACKLISTED_HOSTS = frozenset({
    # social media
    "facebook.com", "www.facebook.com", "twitter.com", "www.twitter.com",
    "t.co", "instagram.com", "www.instagram.com", "linkedin.com",
    "www.linkedin.com", "youtube.com", "www.youtube.com", "tiktok.com",
    "www.tiktok.com", "reddit.com", "www.reddit.com", "quora.com",
    "www.quora.com", "medium.com", "www.medium.com", "pinterest.com",
    "www.pinterest.com",
    # translation & search
    "m.baidu.com", "baidu.com", "translate.google.com",
    # tracking & ads
    "doubleclick.net", "googletagmanager.com", "google-analytics.com",
    "adservice.google.com", "scorecardresearch.com", "taboola.com",
    "outbrain.com",
    # CDN & static
    "api.nytimes.com", "api.bbc.com", "static.nytimes.com", "cdn.cnn.com",
    "cdn.britannica.com", "akamaihd.net", "cloudfront.net", "fastly.net",
    # local
    "localhost", "127.0.0.1",
})

BLACKLISTED_SUBSTRINGS = [
    "?utm_", "&utm_", "gclid=", "fbclid=",
    "?ref=", "?source=",
    "/login", "/signin", "/logout", "/subscribe", "/account", "/profile",
    "/register", "/checkout", "/cart",
    "/search?", "/?q=", "query=",
    "/calendar", "/events/", "/year/", "/month/", "/day/",
    "/share?", "/facebook.com/sharer", "/twitter.com/share",
    "/api/", "/graphql", "/ajax/", "/feeds/", ".json", ".xml",
    "/print/", "?print",
    ";jsessionid=",
]

BLACKLISTED_EXTENSIONS = [
    ".jpg", ".jpeg", ".png", ".gif", ".svg", ".webp",
    ".mp4", ".mov", ".avi", ".mkv", ".webm", ".mp3", ".wav",
    ".pdf", ".doc", ".docx", ".ppt", ".pptx", ".xls", ".xlsx",
    ".zip", ".tar", ".gz", ".tgz", ".rar", ".7z",
    ".css", ".js", ".woff", ".woff2", ".ttf", ".eot",
    ".php", ".aspx",
]

BLACKLISTED_LANGUAGE = ["/es/", "/de/", "/fr/", "/ja/", "/zh/", "/ru/", "/ar/"]
